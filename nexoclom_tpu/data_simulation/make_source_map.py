"""Source-map estimation: histogram the initial states of model runs into
surface abundance + speed/altitude/azimuth distributions, globally and per
surface point with an angular smear.

Parity with ``nexoclom/data_simulation/make_source_map.py`` and the merge/
normalisation in ``LOSResult.make_source_map`` (``LOSResult.py:310-491``):

* grids: 180 x 90 lon/lat bins, 100 speed bins over [0, ceil(vmax km/s)],
  23 altitude bins over [0, pi/2], 45 azimuth bins over [0, 2 pi];
* 'source' view weights by X0.frac, 'available' view weights by 1;
* ``included`` = X0.frac > 0 (meaningful for fitted outputs whose X0 frac was
  reweighted by the retrieval; all-True otherwise) and
  ``fraction_observed = n_included / n_total`` corrects the abundance;
* the per-point smear uses great-circle (haversine) distance with the
  reference's radius scaling smear_radius * cos(latitude)
  (``make_source_map.py:114``);
* flux normalisation divides by the spherical cell area
  R^2 dlon (sin(lat+dlat/2) - sin(lat-dlat/2)) and scales by the fitted
  source rate (``LOSResult.py:389-415``).

Simplification vs the reference (documented in docs/QUIRKS.md): all outputs
are histogrammed on one common speed grid (the reference interpolates
per-output grids onto the widest one, double-adding the widest output's
distribution in the process — ``LOSResult.py:358-366``).

The per-point smear is an O(gridpoints x packets) masked reduction, chunked
over grid points and jitted.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.initial_state.sourcemap import SourceMap
from nexoclom_tpu.ops.histograms import histogram1d
from nexoclom_tpu.particle_tracking.output import Output

DEFAULT_PARAMS = dict(smear_radius=np.radians(10), nlonbins=180, nlatbins=90,
                      nvelbins=100, nazbins=45, naltbins=23,
                      smear_abundance=True)


def _haversine(lat1, lon1, lat2, lon2):
    dlat = 0.5 * (lat2 - lat1)
    dlon = 0.5 * (lon2 - lon1)
    h = (jnp.sin(dlat) ** 2 +
         jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon) ** 2)
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(h, 0.0, 1.0)))


@partial(jax.jit, static_argnames=('nvelbins', 'naltbins', 'nazbins',
                                   'chunk'))
def _smeared_point_stats(grid_lat, grid_lon, radius_scale,
                         lat, lon, weight, included, v_kms, altitude,
                         azimuth, vmax, nvelbins: int, naltbins: int,
                         nazbins: int, chunk: int = 64):
    """Per-grid-point smeared statistics via chunked masked reductions.

    Returns (n_included, n_total, abundance, v_hist, alt_hist, az_hist) with
    leading dimension len(grid_lat).
    """
    npts = grid_lat.shape[0]
    pad = (-npts) % chunk
    grid_lat = jnp.concatenate([grid_lat, jnp.zeros(pad, grid_lat.dtype)])
    grid_lon = jnp.concatenate([grid_lon, jnp.zeros(pad, grid_lon.dtype)])
    radius_scale = jnp.concatenate(
        [radius_scale, jnp.full(pad, -1.0, radius_scale.dtype)])
    nchunks = (npts + pad) // chunk

    w_incl = jnp.where(included, weight, 0.0)

    def one_point(glat, glon, radius):
        dist = _haversine(glat, glon, lat, lon)
        near = dist < radius
        n_inc = jnp.sum(near & included)
        n_tot = jnp.sum(near)
        abund = jnp.sum(jnp.where(near, weight, 0.0))
        w_near = jnp.where(near, w_incl, 0.0)
        vh = histogram1d(v_kms, w_near, 0.0, vmax, nvelbins)
        ah = histogram1d(altitude, w_near, 0.0, jnp.pi / 2, naltbins)
        zh = histogram1d(azimuth, w_near, 0.0, 2 * jnp.pi, nazbins)
        return n_inc, n_tot, abund, vh, ah, zh

    def body(_, chunk_args):
        return None, jax.vmap(one_point)(*chunk_args)

    _, results = jax.lax.scan(
        body, None,
        (grid_lat.reshape(nchunks, chunk),
         grid_lon.reshape(nchunks, chunk),
         radius_scale.reshape(nchunks, chunk)))
    return tuple(r.reshape((nchunks * chunk,) + r.shape[2:])[:npts]
                 for r in results)


def make_source_map(outputfile: str, params=None, todo='source'):
    """Distribution dict for one output file (reference
    ``make_source_map()``); ``todo`` is 'source' or 'available'."""
    if todo not in ('source', 'available'):
        return None
    params = {**DEFAULT_PARAMS, **(params or {})}
    output = Output.restore(outputfile)
    X0 = output.X0
    radius_km = output.inputs.geometry.planet.radius
    vmax = params.get('vmax')
    if vmax is None:
        vmax = float(np.ceil(X0['v'].max() * radius_km))
    dist = _distribution_for_x0(X0, radius_km, vmax, params, todo)
    return dist


def _distribution_for_x0(X0, radius_km, vmax, params, todo):
    nlon, nlat = params['nlonbins'], params['nlatbins']
    nvel, nalt, naz = (params['nvelbins'], params['naltbins'],
                       params['nazbins'])

    frac = X0['frac'].to_numpy()
    included = frac > 0
    weight = frac if todo == 'source' else np.ones_like(frac)

    lon = X0['longitude'].to_numpy()
    lat = X0['latitude'].to_numpy()
    v_kms = X0['v'].to_numpy() * radius_km
    altitude = X0['altitude'].to_numpy()
    azimuth = X0['azimuth'].to_numpy()

    # bin-centred histograms via the shared mathutils helpers (the
    # reference uses its mathMB.Histogram/Histogram2d here)
    from nexoclom_tpu.mathutils import Histogram, Histogram2d
    abundance = Histogram2d(lon[included], lat[included],
                            bins=(nlon, nlat),
                            range=[[0, 2 * np.pi],
                                   [-np.pi / 2, np.pi / 2]],
                            weights=weight[included])
    h_speed = Histogram(v_kms[included], bins=nvel, range=(0, vmax),
                        weights=weight[included])
    h_alt = Histogram(altitude[included], bins=nalt, range=(0, np.pi / 2),
                      weights=weight[included])
    h_az = Histogram(azimuth[included], bins=naz, range=(0, 2 * np.pi),
                     weights=weight[included])

    lon_centers = abundance.x
    lat_centers = abundance.y
    distribution = {
        'abundance_uncor': abundance.histogram,
        'longitude': lon_centers,
        'latitude': lat_centers,
        'speed_dist': h_speed.histogram,
        'speed': h_speed.x,
        'altitude_dist': h_alt.histogram,
        'altitude': h_alt.x,
        'azimuth_dist': h_az.histogram,
        'azimuth': h_az.x,
    }

    # smeared per-point statistics (grid ordering: lon-major, matching the
    # reference's meshgrid(y, x) flatten)
    gridlat, gridlon = np.meshgrid(lat_centers, lon_centers)
    radius_scale = params['smear_radius'] * np.cos(gridlat.ravel())
    n_inc, n_tot, abund_s, vh, ah, zh = _smeared_point_stats(
        jnp.asarray(gridlat.ravel()), jnp.asarray(gridlon.ravel()),
        jnp.asarray(radius_scale),
        jnp.asarray(lat), jnp.asarray(lon), jnp.asarray(weight),
        jnp.asarray(included), jnp.asarray(v_kms), jnp.asarray(altitude),
        jnp.asarray(azimuth), vmax, nvel, nalt, naz)

    shape = gridlon.shape
    if params['smear_abundance']:
        distribution['abundance_uncor'] = np.asarray(abund_s).reshape(shape)
    distribution['n_included'] = np.asarray(n_inc, float).reshape(shape)
    distribution['n_total'] = np.asarray(n_tot, float).reshape(shape)
    distribution['speed_dist_map'] = np.asarray(vh).reshape(shape + (nvel,))
    distribution['altitude_dist_map'] = np.asarray(ah).reshape(shape + (nalt,))
    distribution['azimuth_dist_map'] = np.asarray(zh).reshape(shape + (naz,))
    return distribution


def build_sourcemap_from_outputs(losresult, params, todo='source',
                                 normalize=True) -> SourceMap:
    """Merge per-output distributions and normalise (reference
    ``LOSResult.make_source_map``, ``LOSResult.py:310-491``)."""
    params = {**DEFAULT_PARAMS, **(params or {})}

    # one restore per file: the vmax scan and the distribution pass reuse
    # the same deserialized Outputs (full-array restores dominate
    # source-map cost on multi-GB stores)
    outputs = [Output.restore(f) for f in losresult.modelfiles]

    # common speed grid over all outputs
    vmax = 0.0
    for output in outputs:
        radius_km = output.inputs.geometry.planet.radius
        vmax = max(vmax, float(np.ceil(output.X0['v'].max() * radius_km)))
    params['vmax'] = vmax

    total = None
    for output in outputs:
        radius_km = output.inputs.geometry.planet.radius
        dist = _distribution_for_x0(output.X0, radius_km, vmax, params, todo)
        if total is None:
            total = dist
        else:
            for key in ('abundance_uncor', 'n_included', 'n_total',
                        'speed_dist', 'speed_dist_map', 'altitude_dist',
                        'altitude_dist_map', 'azimuth_dist',
                        'azimuth_dist_map'):
                total[key] = total[key] + dist[key]

    with np.errstate(invalid='ignore', divide='ignore'):
        fraction = total['n_included'] / total['n_total']
    nan = ~np.isfinite(fraction)
    fraction[nan] = 1.0
    with np.errstate(invalid='ignore', divide='ignore'):
        abundance = total['abundance_uncor'] / fraction
    fraction[nan] = 0.0
    abundance[~np.isfinite(abundance)] = 0.0
    total['fraction_observed'] = fraction
    total['abundance'] = abundance

    if normalize:
        # cell areas: R^2 dlon (sin(lat + dlat/2) - sin(lat - dlat/2)) in cm^2
        radius_cm = losresult.radius_km * 1e5
        dlon = total['longitude'][1] - total['longitude'][0]
        dlat = total['latitude'][1] - total['latitude'][0]
        lat = total['latitude'][None, :]
        area = radius_cm ** 2 * np.abs(
            dlon * (np.sin(lat + dlat / 2) - np.sin(lat - dlat / 2)))
        sourcerate_atoms = losresult.sourcerate * 1e23   # atoms/s

        for key in ('abundance', 'abundance_uncor'):
            s = total[key].sum()
            if s > 0:
                total[key] = total[key] / s / area * sourcerate_atoms

        dv = total['speed'][1] - total['speed'][0]
        # all three global distributions normalise to source-rate densities
        # (per km/s, per rad); the ANGLE AXES are left alone — the
        # reference's normalize block rescales them too (quirk F19)
        for key, width in (
                ('speed_dist', dv),
                ('altitude_dist',
                 total['altitude'][1] - total['altitude'][0]),
                ('azimuth_dist',
                 total['azimuth'][1] - total['azimuth'][0])):
            s = total[key].sum()
            if s > 0:
                total[key] = sourcerate_atoms * total[key] / s / width

        # per-cell distribution maps: abundance x normalised shape
        for map_key, width in (('speed_dist_map', dv),
                               ('altitude_dist_map',
                                total['altitude'][1] - total['altitude'][0]),
                               ('azimuth_dist_map',
                                total['azimuth'][1] - total['azimuth'][0])):
            norm = total[map_key].sum(axis=2, keepdims=True)
            with np.errstate(invalid='ignore', divide='ignore'):
                shaped = total[map_key] / norm / width
            shaped[~np.isfinite(shaped)] = 0.0
            total[map_key] = total['abundance'][:, :, None] * shaped

    source = SourceMap({
        'abundance': total['abundance'],
        'longitude': total['longitude'],
        'latitude': total['latitude'],
        'speed': total['speed'],
        'speed_dist': total['speed_dist'],
        'altitude': total['altitude'],
        'altitude_dist': total['altitude_dist'],
        'azimuth': total['azimuth'],
        'azimuth_dist': total['azimuth_dist'],
        'fraction_observed': total['fraction_observed'],
    })
    source.abundance_uncor = total['abundance_uncor']
    source.n_included = total['n_included']
    source.n_total = total['n_total']
    source.speed_dist_map = total['speed_dist_map']
    source.altitude_dist_map = total['altitude_dist_map']
    source.azimuth_dist_map = total['azimuth_dist_map']
    return source
