"""Sky-plane column/radiance images.

Parity with ``nexoclom/data_simulation/ModelImage.py``:

* params: dims (default 800,800), center (0,0), width (8,8 R_p),
  subobslongitude (0), subobslatitude (pi/2) — observer over the north pole
  by default (``ModelImage.py:53-78``);
* packets rotate into the observer frame with the axis-angle matrix from the
  sub-observer point (``image_rotation``, ``:367-384``);
* planet-occultation mask in the observer frame, shadow mask in the solar
  frame (``:250-258``);
* per-pixel area Apix = (width/dims)^2 in cm^2; radiance scales by
  atoms_per_packet = 1e23 / (totalsource / endtime) (``:77-78,102-105``);
* per-output images cache through the catalog (``save``/``restore``).

The histogram itself is a device scatter-add
(:func:`nexoclom_tpu.ops.histograms.histogram2d`) instead of host
``np.histogram2d``.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.data_simulation.model_result import ModelResult
from nexoclom_tpu.mathutils import rotation_matrix
from nexoclom_tpu.ops.histograms import histogram2d
from nexoclom_tpu.parallel.mesh import resolve_packet_mesh, shard_padded
from nexoclom_tpu.particle_tracking.output import Output
from nexoclom_tpu.utilities.catalog import get_catalog

CM_PER_KM = 1.0e5


class ModelImage(ModelResult):
    def __init__(self, inputs, params, overwrite=False, sharded=False):
        super().__init__(inputs, params)
        self.type = 'image'
        # same flagship switch as Input.run/LOSResult: shard the packet
        # axis of the histogram scatter-adds over local devices (the
        # per-pixel sums cross shards through an XLA psum; weighted
        # pixels match the single-device image up to f64 summation
        # order, packet counts exactly)
        self.sharded = sharded
        # quirk F26: params['origin'] selects the image center/unit body.
        # The reference declares this (ModelImage.py:49-51) but its
        # non-planet path calls transform_reference_frame, which exists
        # nowhere (only a commented stub, SourceMap.py:89) — it crashes.
        # Here any moon of the geometry works: coordinates are measured
        # from the MOVING moon's center at each snapshot's time, in moon
        # radii; occultation/shadow stay in the physical frame.
        self.origin, self._origin_orbit = self._resolve_origin(inputs)

        dims = str(self.params.get('dims', '800,800')).split(',')
        self.dims = [int(dims[0]), int(dims[1])]
        center = str(self.params.get('center', '0,0')).split(',')
        self.center = [float(center[0]), float(center[1])]
        width = str(self.params.get('width', '8,8')).split(',')
        self.width = [float(width[0]), float(width[1])]
        self.subobslongitude = float(self.params.get('subobslongitude', 0.0))
        self.subobslatitude = float(self.params.get('subobslatitude',
                                                    np.pi / 2))

        self.image = np.zeros(self.dims)
        self.packet_image = np.zeros(self.dims)
        self.xrange = [self.center[0] - self.width[0] / 2,
                       self.center[0] + self.width[0] / 2]
        self.zrange = [self.center[1] - self.width[1] / 2,
                       self.center[1] + self.width[1] / 2]
        scale = (self.width[0] / self.dims[0], self.width[1] / self.dims[1])
        # pixel geometry in ORIGIN radii (= planet radii unless F26)
        radius_cm = self.origin.radius * CM_PER_KM
        self.Apix = scale[0] * scale[1] * radius_cm ** 2   # cm^2

        self.xaxis = None
        self.zaxis = None
        self.outid, self.outputfiles, _, _ = self.inputs.search()
        from nexoclom_tpu.utilities.catalog import get_catalog
        records = {r['filename']: r for r in
                   get_catalog().search_outputs(self.inputs.to_dict())}

        for fname in self.outputfiles:
            print(f'Output filename: {fname}')
            cached = self.restore(fname, overwrite=overwrite)
            if cached is None:
                image, packim = self.create_image(fname)
            else:
                print('previously completed.')
                image, packim = cached
            self.image += image
            self.packet_image += packim
            # totalsource comes from the catalog record — restoring the
            # multi-GB array store just for one scalar doubled (cached
            # path: entirely wasted) the image-generation IO
            self.totalsource += records[fname]['totalsource']

        mod_rate = self.totalsource / self.inputs.options.endtime
        self.atoms_per_packet = 1e23 / mod_rate
        self.sourcerate = 1.0       # x 1e23 atoms/s
        self.image *= self.atoms_per_packet
        dx = (self.xrange[1] - self.xrange[0]) / self.dims[0]
        dz = (self.zrange[1] - self.zrange[0]) / self.dims[1]
        self.xaxis = self.xrange[0] + dx * (np.arange(self.dims[0]) + 0.5)
        self.zaxis = self.zrange[0] + dz * (np.arange(self.dims[1]) + 0.5)

    # ------------------------------------------------------------- geometry
    def _resolve_origin(self, inputs):
        """(origin SSObject, orbit params or None) from params['origin'].

        For a moon origin returns ``(a_rp, omega, phi_obs)`` — enough to
        place the moving moon at any snapshot time (quirk F26)."""
        from nexoclom_tpu.utilities.exceptions import InputError
        planet = inputs.geometry.planet
        name = str(self.params.get('origin', planet.object)).title()
        if name == planet.object:
            return planet, None
        moon = next((o for o in inputs.geometry.objects
                     if o.object == name), None)
        if moon is None:
            raise InputError(
                'ModelImage', f'origin {name!r} is not the planet or an '
                f'object included in the geometry')
        from nexoclom_tpu.initial_state.satellites import (moon_phi,
                                                           orbit_params)
        a_rp, omega = orbit_params(planet, moon)
        return moon, (a_rp, omega, moon_phi(inputs.geometry, name))

    def image_rotation(self) -> np.ndarray:
        """Sun-frame -> observer-frame rotation from the sub-observer point
        (``ModelImage.py:367-384``)."""
        slong, slat = self.subobslongitude, self.subobslatitude
        p_sun = np.array([0.0, -1.0, 0.0])
        p_obs = np.array([np.sin(slong) * np.cos(slat),
                          -np.cos(slong) * np.cos(slat),
                          np.sin(slat)])
        if np.allclose(p_sun, p_obs):
            return np.eye(3)
        costh = np.clip(np.dot(p_sun, p_obs), -1.0, 1.0)
        return rotation_matrix(np.arccos(costh), np.cross(p_sun, p_obs))

    # -------------------------------------------------------------- compute
    def create_image(self, fname):
        M = self.image_rotation()
        # positions + weighting inputs only ('time' feeds the F26
        # moon-centered frame and the moving-moon occultors)
        output = Output.restore(
            fname, columns={'X': ('x', 'y', 'z', 'vy', 'frac', 'time')})
        packets = output.X
        vr_model = output.vrplanet / self.radius_km

        pts_sun = packets[['x', 'y', 'z']].to_numpy(dtype=float)
        pts_obs = pts_sun @ M.T

        # planet occultation in the observer frame (observer at +y_obs...
        # reference convention: blocked when rho_obs < 1 and y_obs > 0)
        rho_obs = np.sqrt(pts_obs[:, 0] ** 2 + pts_obs[:, 2] ** 2)
        inview = (rho_obs > 1) | (pts_obs[:, 1] < 0)

        rho_sun = np.sqrt(pts_sun[:, 0] ** 2 + pts_sun[:, 2] ** 2)
        out_of_shadow = (rho_sun > 1) | (pts_sun[:, 1] < 0)

        geometry = self.inputs.geometry
        if geometry.startpoint != geometry.planet.object:
            n_rows = len(pts_sun)
            if self._origin_orbit is None:
                # planet-framed satellite images: included moons at their
                # observation phases — the convention shared with the LOS
                # and fused-image pipelines (each history row is read as
                # an observation-time sample of the steady-state cloud)
                from nexoclom_tpu.initial_state.satellites import (
                    moon_occultors)
                moon_list = [(np.broadcast_to(c, (n_rows, 3)), r)
                             for c, r in moon_occultors(geometry)]
            else:
                # F26 moon-centered frame: the frame follows each
                # snapshot's own configuration, so the occulting moons
                # move with it too (phi_obs - omega * t per row) — an
                # atom sitting behind the moon in the relative frame is
                # masked where the moon actually is in that snapshot
                from nexoclom_tpu.initial_state.satellites import (
                    moon_occultor_orbits)
                from nexoclom_tpu.ops.integrator import orbit_state
                t_rows = packets['time'].to_numpy(dtype=float)
                moon_list = []
                for a_rp, omega, phi_obs, r in moon_occultor_orbits(
                        geometry):
                    cx, cy, _, _ = orbit_state(
                        a_rp, omega, phi_obs - omega * t_rows, xp=np)
                    moon_list.append(
                        (np.stack([cx, cy, np.zeros_like(cx)], axis=1), r))
            for c, r in moon_list:
                c_obs = c @ M.T
                behind = (((pts_obs[:, 0] - c_obs[:, 0]) ** 2 +
                           (pts_obs[:, 2] - c_obs[:, 2]) ** 2 < r * r) &
                          (pts_obs[:, 1] > c_obs[:, 1]))
                inview &= ~behind
                shadowed = (((pts_sun[:, 0] - c[:, 0]) ** 2 +
                             (pts_sun[:, 2] - c[:, 2]) ** 2 < r * r) &
                            (pts_sun[:, 1] > c[:, 1]))
                out_of_shadow &= ~shadowed

        frac = packets['frac'].to_numpy() * inview
        radvel = packets['vy'].to_numpy() + vr_model
        weight = self.packet_weighting(frac, radvel, output.aplanet,
                                       out_of_shadow) / self.Apix

        if self._origin_orbit is None:
            pts_img = pts_obs
        else:
            # quirk F26: moon-centered image — subtract the MOVING moon's
            # center at each snapshot's own time and rescale to moon radii
            # (the occultation/shadow masks above stay in the physical
            # frame).  Single phase source: ops.integrator.orbit_state.
            from nexoclom_tpu.ops.integrator import orbit_state
            a_rp, omega, phi_obs = self._origin_orbit
            t = packets['time'].to_numpy(dtype=float)
            cx, cy, _, _ = orbit_state(a_rp, omega, phi_obs - omega * t,
                                       xp=np)
            rel = pts_sun - np.stack(
                [cx, cy, np.zeros_like(cx)], axis=1)
            scale = self.origin.radius / self.radius_km
            pts_img = (rel @ M.T) / scale

        xs = jnp.asarray(pts_img[:, 0])
        zs = jnp.asarray(pts_img[:, 2])
        ws = jnp.asarray(weight)
        ones = jnp.ones(len(pts_img))
        mesh = resolve_packet_mesh(self.sharded, 'ModelImage')
        if mesh is not None:
            # pad sentinel 1e30 lands outside every image range so the
            # padding never bins; weight 0 is belt-and-braces
            (xs, zs, ws, ones), _ = shard_padded(
                mesh, (xs, zs, ws, ones), (1e30, 1e30, 0.0, 0.0))
            ctx = mesh
        else:
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            image = np.asarray(histogram2d(
                xs, zs, ws,
                self.xrange[0], self.xrange[1], self.dims[0],
                self.zrange[0], self.zrange[1], self.dims[1], impl='auto'))
            packim = np.asarray(histogram2d(
                xs, zs, ones,
                self.xrange[0], self.xrange[1], self.dims[0],
                self.zrange[0], self.zrange[1], self.dims[1], impl='auto'))

        self.save(fname, image, packim)
        return image, packim

    # ---------------------------------------------------------- persistence
    def _criteria(self, out_idnum):
        crit = dict(out_idnum=out_idnum, quantity=self.quantity,
                    origin=self.origin.object, dims=list(self.dims),
                    center=list(self.center), width=list(self.width),
                    subobslongitude=self.subobslongitude,
                    subobslatitude=self.subobslatitude,
                    mechanism=list(self.mechanism or []))
        if self.quantity == 'radiance':
            crit['wavelength'] = list(self.wavelength or [])
            crit['g'] = self.g
        return crit

    def _out_idnum(self, fname):
        for oid, file in zip(self.outid, self.outputfiles):
            if file == fname:
                return oid
        raise KeyError(fname)

    def save(self, fname, image, packim):
        catalog = get_catalog()
        idnum = catalog.insert_image(**self._criteria(self._out_idnum(fname)))
        self.idnum = idnum
        savefile = os.path.join(os.path.dirname(fname), f'image.{idnum}.npz')
        catalog.images.update(idnum, filename=savefile)
        np.savez_compressed(savefile, image=image, packets=packim)

    def restore(self, fname, overwrite=False):
        catalog = get_catalog()
        rows = catalog.search_images(**self._criteria(self._out_idnum(fname)))
        if rows and overwrite:
            catalog.images.delete([r['idnum'] for r in rows])
            for row in rows:
                if row.get('filename') and os.path.exists(row['filename']):
                    os.remove(row['filename'])
            return None
        for row in rows:
            path = row.get('filename')
            if path and os.path.exists(path):
                with np.load(path) as data:
                    return data['image'], data['packets']
        return None

    # ----------------------------------------------------------- reporting
    def display(self, savefile='image.png', show=False, log=True,
                limits=None):
        """Render with matplotlib (the reference used bokeh, unavailable
        here)."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from matplotlib.colors import LogNorm, Normalize

        positive = self.image[self.image > 0]
        if limits is None:
            if log and positive.size:
                limits = (positive.min(), self.image.max())
            else:
                limits = (0, self.image.max() or 1)
        norm = (LogNorm(*limits) if log and positive.size
                else Normalize(*limits))

        fig, ax = plt.subplots(figsize=(8, 8))
        mesh = ax.pcolormesh(self.xaxis, self.zaxis, self.image.T,
                             norm=norm, cmap='inferno')
        theta = np.linspace(0, 2 * np.pi, 361)
        ax.fill(np.cos(theta), np.sin(theta), color='gold')
        ax.set_xlabel(f'Distance (R_{self.origin.object})')
        ax.set_ylabel(f'Distance (R_{self.origin.object})')
        unit = 'kR' if self.quantity == 'radiance' else 'cm$^{-2}$'
        fig.colorbar(mesh, ax=ax,
                     label=f'{self.inputs.options.species} '
                           f'{self.quantity} ({unit})')
        ax.set_aspect('equal')
        fig.savefig(savefile, dpi=150)
        if not show:
            plt.close(fig)
        return fig

    def export(self, filename='image.json'):
        if not filename.endswith('.json'):
            raise TypeError('Not a valid file format')
        with open(filename, 'w') as f:
            json.dump({'image': self.image.tolist(),
                       'xaxis': self.xaxis.tolist(),
                       'zaxis': self.zaxis.tolist()}, f)

    def export_html(self, filename='image.html', log=True):
        """Self-contained interactive HTML view — the role of the
        reference's bokeh page (``ModelImage.display``,
        ``ModelImage.py:276-365``) without the bokeh dependency: canvas
        rendering with a hover readout of (x, z, value) and a log/linear
        toggle, data embedded inline so the file works offline."""
        if not filename.endswith('.html'):
            raise TypeError('Not a valid file format')
        unit = 'kR' if self.quantity == 'radiance' else 'atoms/cm2'
        payload = json.dumps({
            'image': np.asarray(self.image, np.float64).tolist(),
            'xaxis': np.asarray(self.xaxis, np.float64).tolist(),
            'zaxis': np.asarray(self.zaxis, np.float64).tolist(),
            'label': (f'{self.inputs.options.species} {self.quantity} '
                      f'({unit})'),
            'radius_label': f'R_{self.origin.object}',
            'log': bool(log)})
        html = _IMAGE_HTML_TEMPLATE.replace('__PAYLOAD__', payload)
        with open(filename, 'w') as f:
            f.write(html)
        return filename


# 8-stop inferno approximation, linearly interpolated client-side
_IMAGE_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>nexoclom_tpu image</title>
<style>
 body { font-family: sans-serif; background: #111; color: #ddd;
        display: flex; flex-direction: column; align-items: center; }
 #wrap { position: relative; }
 canvas { image-rendering: pixelated; border: 1px solid #444; }
 #readout { font: 13px monospace; margin: 8px; min-height: 1em; }
 button { margin: 6px; }
</style></head><body>
<h3 id="title"></h3>
<div id="wrap"><canvas id="c"></canvas></div>
<div id="readout">&nbsp;</div>
<button id="toggle"></button>
<script>
const D = __PAYLOAD__;
const nx = D.xaxis.length, nz = D.zaxis.length;
const STOPS = [[0,0,4],[40,11,84],[101,21,110],[159,42,99],
               [212,72,66],[245,125,21],[250,193,39],[252,255,164]];
function cmap(t) {
  t = Math.min(Math.max(t, 0), 1) * (STOPS.length - 1);
  const i = Math.min(Math.floor(t), STOPS.length - 2), f = t - i;
  return STOPS[i].map((v, k) => Math.round(v + f * (STOPS[i+1][k] - v)));
}
let useLog = D.log;
const canvas = document.getElementById('c');
const scale = Math.max(1, Math.floor(700 / Math.max(nx, nz)));
canvas.width = nx; canvas.height = nz;
canvas.style.width = (nx * scale) + 'px';
canvas.style.height = (nz * scale) + 'px';
document.getElementById('title').textContent = D.label;
function draw() {
  let vmax = -Infinity, vminpos = Infinity;
  for (const row of D.image) for (const v of row) {
    if (v > vmax) vmax = v;
    if (v > 0 && v < vminpos) vminpos = v;
  }
  if (!isFinite(vminpos)) { vminpos = 1; vmax = vmax || 1; }
  const ctx = canvas.getContext('2d');
  const img = ctx.createImageData(nx, nz);
  for (let i = 0; i < nx; i++) for (let j = 0; j < nz; j++) {
    const v = D.image[i][j];
    let t;
    if (useLog) t = v <= 0 ? 0 :
      (Math.log(v) - Math.log(vminpos)) / (Math.log(vmax) - Math.log(vminpos) || 1);
    else t = v / (vmax || 1);
    const [r, g, b] = cmap(t);
    const p = 4 * ((nz - 1 - j) * nx + i);   // z up
    img.data[p] = r; img.data[p+1] = g; img.data[p+2] = b;
    img.data[p+3] = 255;
  }
  ctx.putImageData(img, 0, 0);
  document.getElementById('toggle').textContent =
    useLog ? 'switch to linear scale' : 'switch to log scale';
}
document.getElementById('toggle').onclick = () => { useLog = !useLog; draw(); };
canvas.onmousemove = (e) => {
  const r = canvas.getBoundingClientRect();
  const i = Math.floor((e.clientX - r.left) / r.width * nx);
  const j = nz - 1 - Math.floor((e.clientY - r.top) / r.height * nz);
  if (i < 0 || i >= nx || j < 0 || j >= nz) return;
  document.getElementById('readout').textContent =
    'x=' + D.xaxis[i].toFixed(2) + ' ' + D.radius_label +
    '  z=' + D.zaxis[j].toFixed(2) + ' ' + D.radius_label +
    '  value=' + D.image[i][j].toExponential(3);
};
draw();
</script></body></html>
"""
