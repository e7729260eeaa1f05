"""Point densities from saved model runs.

Parity with ``nexoclom/data_simulation/ModelDensity.py``: the density at each
sample point is the frac sum of packets within radius ``dr`` (default
0.05 R_p) divided by the pixel volume, scaled by atoms_per_packet.  The
KDTree ball query becomes a chunked masked reduction on device.

Normalisation parity note (docs/QUIRKS.md): the reference computes
``Vpix = 4/3/pi * dr^3`` (``ModelDensity.py:58``) — a pi^2 factor off the
volume of a sphere.  The formula is replicated so densities match the
reference numerically; pass ``true_volume=True`` for the physically correct
``4 pi/3 dr^3``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.particle_tracking.output import Output

CM_PER_KM = 1.0e5


@partial(jax.jit, static_argnames=('chunk',))
def _density_reduce(px, py, pz, frac, qx, qy, qz, dr, chunk: int = 128):
    npts = qx.shape[0]
    pad = (-npts) % chunk
    qx = jnp.concatenate([qx, jnp.full(pad, 1e30, qx.dtype)])
    qy = jnp.concatenate([qy, jnp.zeros(pad, qy.dtype)])
    qz = jnp.concatenate([qz, jnp.zeros(pad, qz.dtype)])
    nchunks = (npts + pad) // chunk

    def one_point(x0, y0, z0):
        d2 = (px - x0) ** 2 + (py - y0) ** 2 + (pz - z0) ** 2
        near = d2 <= dr * dr
        return jnp.sum(jnp.where(near, frac, 0.0)), jnp.sum(near)

    def body(_, args):
        return None, jax.vmap(one_point)(*args)

    _, (dens, count) = jax.lax.scan(
        body, None, (qx.reshape(nchunks, chunk), qy.reshape(nchunks, chunk),
                     qz.reshape(nchunks, chunk)))
    return dens.reshape(-1)[:npts], count.reshape(-1)[:npts]


class ModelDensity:
    def __init__(self, inputs, xpts, ypts, zpts, dr=0.05,
                 true_volume=False, sharded=False):
        self.type = 'density'
        # same flagship switch as the other observables: shard the packet
        # axis of the per-point reductions over local devices
        self.sharded = sharded
        self.origin = inputs.geometry.planet
        self.inputs = inputs
        radius_cm = self.origin.radius * CM_PER_KM

        xpts = np.atleast_1d(np.asarray(xpts, dtype=float))
        ypts = np.atleast_1d(np.asarray(ypts, dtype=float))
        zpts = np.atleast_1d(np.asarray(zpts, dtype=float))

        self.dr = float(dr)
        dr_cm = self.dr * radius_cm
        if true_volume:
            self.Vpix = 4.0 * np.pi / 3.0 * dr_cm ** 3
        else:
            # reference formula (ModelDensity.py:58) — see QUIRKS.md
            self.Vpix = 4.0 / 3.0 / np.pi * dr_cm ** 3

        self.density = np.zeros(len(xpts))
        self.packets = np.zeros(len(xpts))
        self.totalsource = 0.0

        self.outid, self.outputfiles, _, _ = inputs.search()
        endtime = None
        for fname in self.outputfiles:
            print(f'Output filename: {fname}')
            output = Output.restore(fname)
            X = output.X
            packet_arrays = (jnp.asarray(X['x'].to_numpy()),
                             jnp.asarray(X['y'].to_numpy()),
                             jnp.asarray(X['z'].to_numpy()),
                             jnp.asarray(X['frac'].to_numpy()))
            probe_args = (jnp.asarray(xpts), jnp.asarray(ypts),
                          jnp.asarray(zpts), self.dr)
            from nexoclom_tpu.parallel.mesh import (resolve_packet_mesh,
                                                    shard_padded)
            mesh = resolve_packet_mesh(self.sharded, 'ModelDensity')
            if mesh is not None:
                # pad sentinel 1e30 is never within dr of a probe point
                packet_arrays, _ = shard_padded(
                    mesh, packet_arrays, (1e30, 0.0, 0.0, 0.0))
                with mesh:
                    dens, count = _density_reduce(*packet_arrays,
                                                  *probe_args)
            else:
                dens, count = _density_reduce(*packet_arrays, *probe_args)
            self.density += np.asarray(dens)
            self.packets += np.asarray(count)
            self.totalsource += output.totalsource
            endtime = output.inputs.options.endtime

        if self.totalsource > 0:
            mod_rate = self.totalsource / endtime
            self.atoms_per_packet = 1e23 / mod_rate
        else:
            self.atoms_per_packet = 0.0
        self.sourcerate = 1.0       # x 1e23 atoms/s
        self.density = self.density * self.atoms_per_packet / self.Vpix
