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
over grid points and jitted.  ``cull_block`` (grid param, or inherited from
the LOSResult's ``cull_block``) opts into the two-stage block cull — the
fourth member of the cull family (:func:`nexoclom_tpu.ops.los
.los_reduce_culled`, the fitted accumulate, the density ball query): a 10
degree smear cap covers ~0.8% of the sphere, so most packet blocks are
skippable for most grid points.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.initial_state.sourcemap import SourceMap
from nexoclom_tpu.ops.histograms import _bin_index, histogram1d
from nexoclom_tpu.ops.los import _morton_key
from nexoclom_tpu.particle_tracking.output import Output

DEFAULT_PARAMS = dict(smear_radius=np.radians(10), nlonbins=180, nlatbins=90,
                      nvelbins=100, nazbins=45, naltbins=23,
                      smear_abundance=True, cull_block='auto', sharded=False,
                      compute_dtype=None)


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


def _hist_rows(W, vals, lo, hi, nbins: int):
    """Row-wise weighted histograms by one-hot MXU contraction: for the
    weight matrix W (chunk, n) and one shared sample vector (n,), return
    (chunk, nbins) — every row's histogram in ONE dot_general (the
    ``ops.histograms._histogram2d_matmul`` form; exact 0/1 one-hot
    products, f32+ accumulation, summation order differs from scatter)."""
    idx, ok = _bin_index(vals, lo, hi, nbins)
    onehot = (idx[:, None] == jnp.arange(nbins, dtype=idx.dtype)[None, :]
              ).astype(W.dtype)
    Wok = W * ok.astype(W.dtype)[None, :]
    # HIGHEST: the MXU's default bf16 operand rounding truncates the
    # WEIGHT operand's mantissa (measured 1.4e-4 max rel vs the scatter
    # path on v5e, round-5 smear stage); the 3-pass f32 contraction is
    # exact-to-summation-order and still ~3x the scatter path
    return jax.lax.dot_general(Wok, onehot, (((1,), (0,)), ((), ())),
                               preferred_element_type=W.dtype,
                               precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=('nvelbins', 'naltbins', 'nazbins',
                                   'chunk', 'block', 'hist_impl',
                                   'walk_group'))
def _smeared_point_stats_culled(grid_lat, grid_lon, radius_scale,
                                lat, lon, weight, included, v_kms,
                                altitude, azimuth, vmax, nvelbins: int,
                                naltbins: int, nazbins: int,
                                chunk: int = 64, block: int = 8192,
                                hist_impl: str = 'auto',
                                walk_group: int = 1):
    """:func:`_smeared_point_stats` behind the two-stage block cull.

    The smear's inclusion test is angular — haversine(grid, packet) <
    radius — which on the unit sphere is a CHORD test: theta < r iff
    ||g - p|| < 2 sin(r/2) (monotone for theta in [0, pi]).  So the
    established cull machinery applies verbatim in unit-sphere
    Cartesian coordinates: packets are Morton-sorted ONCE on their unit
    vectors (one multi-operand ``lax.sort``; gather is a scalar loop on
    this TPU), each run of ``block`` sorted packets is bounded by a
    sphere, and per grid-point chunk a conservative bound
    ``||g - c|| - r_block <= 2 sin(radius/2)`` selects the blocks a
    ``lax.while_loop`` tile walk then evaluates exactly.  Grid points
    are ALSO Morton-reordered so each chunk's caps bundle tightly
    (outputs scattered back).  A culled block contains no packet inside
    any of the chunk's caps, so all six statistics are IDENTICAL to the
    dense kernel up to per-point summation order across blocks (the
    integer counts are exactly equal).

    At the default 10 degree smear radius a cap covers ~0.8% of the
    sphere; the win is bounded by how tightly the source is clustered
    and by the chunk's cap bundle (measured 4.3x on CPU at 200k packets
    x a 90x45 grid, half-clustered source, block 4096; see
    docs/scaling.md).

    ``hist_impl``: 'scatter' (``.at[].add`` per grid point — a serial
    ~8.5 ns/update loop on this TPU), 'matmul' (one one-hot MXU
    contraction per statistic per tile computes the WHOLE chunk's
    histograms — exact 0/1 products, summation order differs), or
    'auto' (matmul on accelerators, scatter on CPU).
    """
    npts = grid_lat.shape[0]

    def unit_xyz(la, lo):
        cl = jnp.cos(la)
        return cl * jnp.cos(lo), cl * jnp.sin(lo), jnp.sin(la)

    # ---- grid reorder: Morton key on the grid-point unit vectors
    gx, gy, gz = unit_xyz(grid_lat, grid_lon)
    gkey = _morton_key(gx, gy, gz)
    giota = jnp.arange(npts, dtype=jnp.int32)
    (_, grid_lat, grid_lon, radius_scale, gx, gy, gz,
     gperm) = jax.lax.sort(
        (gkey, grid_lat, grid_lon, radius_scale, gx, gy, gz, giota),
        num_keys=1, is_stable=True)

    pad = (-npts) % chunk
    grid_lat = jnp.concatenate([grid_lat, jnp.zeros(pad, grid_lat.dtype)])
    grid_lon = jnp.concatenate([grid_lon, jnp.zeros(pad, grid_lon.dtype)])
    radius_scale = jnp.concatenate(
        [radius_scale, jnp.full(pad, -1.0, radius_scale.dtype)])
    gx = jnp.concatenate([gx, jnp.ones(pad, gx.dtype)])
    gy = jnp.concatenate([gy, jnp.zeros(pad, gy.dtype)])
    gz = jnp.concatenate([gz, jnp.zeros(pad, gz.dtype)])
    # pad rows (radius_scale = -1) get chord = -inf so they can never
    # select a block in the conservative test below (a finite negative
    # chord ~ -0.96 could still pass against a large block sphere,
    # walking tiles for dead rows — wasted work, results unaffected)
    chord = jnp.where(radius_scale < 0.0, -jnp.inf,
                      2.0 * jnp.sin(0.5 * radius_scale))
    nchunks = (npts + pad) // chunk

    # ---- packet pad (inert: NaN lat fails every haversine compare) + sort
    n = lat.shape[0]
    padn = (-n) % block
    if padn:
        nanpad = jnp.full(padn, jnp.nan, lat.dtype)
        lat = jnp.concatenate([lat, nanpad])
        lon = jnp.concatenate([lon, jnp.zeros(padn, lon.dtype)])
        weight = jnp.concatenate([weight, jnp.zeros(padn, weight.dtype)])
        included = jnp.concatenate([included, jnp.zeros(padn, bool)])
        v_kms = jnp.concatenate([v_kms, jnp.zeros(padn, v_kms.dtype)])
        altitude = jnp.concatenate(
            [altitude, jnp.zeros(padn, altitude.dtype)])
        azimuth = jnp.concatenate([azimuth, jnp.zeros(padn, azimuth.dtype)])
    n_pad = n + padn
    nblocks = n_pad // block

    ux, uy, uz = unit_xyz(lat, lon)
    key = _morton_key(ux, uy, uz)
    (_, lat_s, lon_s, w_s, incl_f, v_s, alt_s, az_s, ux_s, uy_s,
     uz_s) = jax.lax.sort(
        (key, lat, lon, weight, included.astype(jnp.float32), v_kms,
         altitude, azimuth, ux, uy, uz), num_keys=1, is_stable=True)
    incl_s = incl_f > 0.5
    wi_s = jnp.where(incl_s, w_s, 0.0)

    # per-block bounding spheres of the packet unit vectors (nan-aware)
    def blk(v):
        return v.reshape(nblocks, block)

    bxl, bxh = jnp.nanmin(blk(ux_s), 1), jnp.nanmax(blk(ux_s), 1)
    byl, byh = jnp.nanmin(blk(uy_s), 1), jnp.nanmax(blk(uy_s), 1)
    bzl, bzh = jnp.nanmin(blk(uz_s), 1), jnp.nanmax(blk(uz_s), 1)
    cx, cy, cz = (bxl + bxh) / 2, (byl + byh) / 2, (bzl + bzh) / 2
    br = 0.5 * jnp.sqrt((bxh - bxl) ** 2 + (byh - byl) ** 2
                        + (bzh - bzl) ** 2)
    iota_b = jnp.arange(nblocks, dtype=jnp.int32)

    def point_test(gx1, gy1, gz1, chord1):
        dx = cx - gx1
        dy = cy - gy1
        dz = cz - gz1
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        # all-NaN (pure pad) blocks: NaN center -> comparison False
        return d - br <= chord1

    impl = hist_impl
    if impl == 'auto':
        # scatter-add is a serial ~8.5 ns/update loop on this TPU; the
        # one-hot MXU contraction computes the whole chunk's histograms
        # in one dot_general per statistic per tile
        impl = 'matmul' if jax.default_backend() != 'cpu' else 'scatter'

    def chunk_tile_stats(glat, glon, radius, latt, lont, wt, wit, inct,
                         vt, altt, azt):
        dist = _haversine(glat[:, None], glon[:, None],
                          latt[None, :], lont[None, :])
        near = dist < radius[:, None]                  # (chunk, tile)
        n_inc = jnp.sum(near & inct[None, :], axis=1)
        n_tot = jnp.sum(near, axis=1)
        abund = jnp.sum(jnp.where(near, wt[None, :], 0.0), axis=1)
        W = jnp.where(near, wit[None, :], 0.0)
        if impl == 'matmul':
            vh = _hist_rows(W, vt, 0.0, vmax, nvelbins)
            ah = _hist_rows(W, altt, 0.0, jnp.pi / 2, naltbins)
            zh = _hist_rows(W, azt, 0.0, 2 * jnp.pi, nazbins)
        else:
            vh = jax.vmap(
                lambda w: histogram1d(vt, w, 0.0, vmax, nvelbins))(W)
            ah = jax.vmap(
                lambda w: histogram1d(altt, w, 0.0, jnp.pi / 2,
                                      naltbins))(W)
            zh = jax.vmap(
                lambda w: histogram1d(azt, w, 0.0, 2 * jnp.pi, nazbins))(W)
        return n_inc, n_tot, abund, vh, ah, zh

    def body(_, operands):
        glat, glon, radius, gxc, gyc, gzc, chordc = operands
        pred = jnp.any(
            jax.vmap(point_test)(gxc, gyc, gzc, chordc), axis=0)
        k = jnp.sum(pred)
        order = jnp.sort(jnp.where(pred, iota_b, nblocks))
        ntrips = -(-k // walk_group)

        def tile_cond(c):
            return c[0] < ntrips

        def tile_body(c):
            t, ni, nt, ab, vh, ah, zh = c
            # walk_group tiles per trip (the round-5 LOS-cull lever):
            # masked past-k slots contribute exact zeros
            for g in range(walk_group):
                j = t * walk_group + g
                valid = j < k
                bid = order[jnp.minimum(j, nblocks - 1)]
                off = jnp.where(valid, bid, 0) * block
                args = tuple(
                    jax.lax.dynamic_slice_in_dim(a, off, block)
                    for a in (lat_s, lon_s, w_s, wi_s, incl_s,
                              v_s, alt_s, az_s))
                ni_t, nt_t, ab_t, vh_t, ah_t, zh_t = chunk_tile_stats(
                    glat, glon, radius, *args)
                ni = ni + jnp.where(valid, ni_t, 0)
                nt = nt + jnp.where(valid, nt_t, 0)
                ab = ab + jnp.where(valid, ab_t, 0.0)
                vh = vh + jnp.where(valid, vh_t, 0.0)
                ah = ah + jnp.where(valid, ah_t, 0.0)
                zh = zh + jnp.where(valid, zh_t, 0.0)
            return (t + 1, ni, nt, ab, vh, ah, zh)

        cnt_dtype = jnp.asarray(0).dtype   # default int (int64 under x64)
        out = jax.lax.while_loop(
            tile_cond, tile_body,
            (jnp.asarray(0, k.dtype),
             jnp.zeros(chunk, cnt_dtype), jnp.zeros(chunk, cnt_dtype),
             jnp.zeros(chunk, lat.dtype),
             jnp.zeros((chunk, nvelbins), lat.dtype),
             jnp.zeros((chunk, naltbins), lat.dtype),
             jnp.zeros((chunk, nazbins), lat.dtype)))
        return None, out[1:]

    _, results = jax.lax.scan(
        body, None,
        tuple(a.reshape((nchunks, chunk) + a.shape[1:])
              for a in (grid_lat, grid_lon, radius_scale,
                        gx, gy, gz, chord)))
    # drop the grid pad, then scatter rows back to the caller's order
    out = []
    for r in results:
        rows = r.reshape((nchunks * chunk,) + r.shape[2:])[:npts]
        out.append(jnp.zeros_like(rows).at[gperm].set(rows))
    return tuple(out)


@partial(jax.jit, static_argnames=('nvelbins', 'naltbins', 'nazbins',
                                   'chunk', 'block', 'mesh', 'hist_impl'))
def _smeared_sharded_fn(grid_lat, grid_lon, radius_scale, lat, lon, weight,
                        included, v_kms, altitude, azimuth, vmax,
                        nvelbins, naltbins, nazbins, chunk, block, mesh,
                        hist_impl='auto'):
    p_pack = jax.sharding.PartitionSpec('packets')
    p_rep = jax.sharding.PartitionSpec()

    def shard_body(latl, lonl, wl, incl, vl, altl, azl,
                   glat, glon, rs, vm):
        if block:
            out = _smeared_point_stats_culled(
                glat, glon, rs, latl, lonl, wl, incl, vl, altl, azl, vm,
                nvelbins, naltbins, nazbins, chunk=chunk, block=block,
                hist_impl=hist_impl)
        else:
            out = _smeared_point_stats(
                glat, glon, rs, latl, lonl, wl, incl, vl, altl, azl, vm,
                nvelbins, naltbins, nazbins, chunk=chunk)
        return tuple(jax.lax.psum(o, 'packets') for o in out)

    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(p_pack,) * 7 + (p_rep,) * 4,
        out_specs=(p_rep,) * 6, check_vma=False)(
        lat, lon, weight, included, v_kms, altitude, azimuth,
        grid_lat, grid_lon, radius_scale, vmax)


def _smeared_point_stats_sharded(grid_lat, grid_lon, radius_scale,
                                 lat, lon, weight, included, v_kms,
                                 altitude, azimuth, vmax, nvelbins: int,
                                 naltbins: int, nazbins: int, mesh,
                                 chunk: int = 64, block: int = 0,
                                 hist_impl: str = 'auto'):
    """Smeared per-point statistics over a packet-sharded mesh — the
    family pattern (:func:`nexoclom_tpu.ops.los.los_reduce_culled_sharded`):
    each device smears (and, with ``block``, culls) ONLY its local packet
    shard under ``jax.shard_map``; one psum joins each of the six
    per-grid-point statistics.  Packet arrays must be pre-padded/placed
    (``shard_padded``; NaN latitude pads fail every haversine compare,
    zero weight/False included keep the sums exact)."""
    return _smeared_sharded_fn(
        jnp.asarray(grid_lat), jnp.asarray(grid_lon),
        jnp.asarray(radius_scale), lat, lon, weight, included, v_kms,
        altitude, azimuth, jnp.asarray(vmax, lat.dtype),
        nvelbins, naltbins, nazbins, chunk, int(block or 0), mesh,
        hist_impl)


def make_source_map(outputfile: str, params=None, todo='source'):
    """Distribution dict for one output file (reference
    ``make_source_map()``); ``todo`` is 'source' or 'available'."""
    if todo not in ('source', 'available'):
        return None
    params = {**DEFAULT_PARAMS, **(params or {})}
    # source maps bin initial states only — skip the (much larger) X frame
    output = Output.restore(outputfile, columns={'X0': None})
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
    # accelerator default: the dense smear is 3 serial scatter-add
    # histograms over every (point, packet) pair (~8.5 ns/update on this
    # TPU — minutes at production geometry); the cull is exact, so it is
    # the right default wherever scatter is serial.  2048 is the
    # measured-best block on v5e (round-5 smear ladder: 0.44/0.56/0.76 s
    # at 2048/4096/8192, 1M packets x 180x90 grid, ~49x the dense
    # extrapolation)
    from nexoclom_tpu.ops.los import resolve_cull_block
    cull_block = resolve_cull_block(params.get('cull_block', 'auto'),
                                    accel_default=2048)
    from nexoclom_tpu.parallel.mesh import resolve_packet_mesh, shard_padded
    mesh = resolve_packet_mesh(params.get('sharded', False),
                               'make_source_map')
    # forced retrieval dtype (CRN accuracy probe) covers the smear too
    cdt = params.get('compute_dtype')
    packet_arrays = (jnp.asarray(lat, dtype=cdt), jnp.asarray(lon, dtype=cdt),
                     jnp.asarray(weight, dtype=cdt), jnp.asarray(included),
                     jnp.asarray(v_kms, dtype=cdt),
                     jnp.asarray(altitude, dtype=cdt),
                     jnp.asarray(azimuth, dtype=cdt))
    if mesh is not None:
        # NaN latitude pads fail every haversine compare (inert rows)
        packet_arrays, _ = shard_padded(
            mesh, packet_arrays, (np.nan, 0.0, 0.0, False, 0.0, 0.0, 0.0))
        smear = partial(_smeared_point_stats_sharded, mesh=mesh,
                        block=cull_block)
    elif cull_block:
        smear = partial(_smeared_point_stats_culled, block=cull_block)
    else:
        smear = _smeared_point_stats
    n_inc, n_tot, abund_s, vh, ah, zh = smear(
        jnp.asarray(gridlat.ravel(), dtype=cdt),
        jnp.asarray(gridlon.ravel(), dtype=cdt),
        jnp.asarray(radius_scale, dtype=cdt), *packet_arrays,
        vmax=vmax, nvelbins=nvel, naltbins=nalt, nazbins=naz)

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
    explicit = params or {}
    params = {**DEFAULT_PARAMS, **explicit}
    if ('cull_block' not in explicit
            and getattr(losresult, 'cull_block', None) is not None):
        # inherit the LOSResult's explicit cull choice — opt-in OR an
        # explicit 0 dense opt-out (the whole pairwise family rides one
        # switch); an unset LOSResult (None) leaves DEFAULT_PARAMS'
        # 'auto' to pick the backend-appropriate form
        params['cull_block'] = losresult.cull_block
    if 'sharded' not in explicit:
        params['sharded'] = getattr(losresult, 'sharded', False)
    if 'compute_dtype' not in explicit:
        # the CRN accuracy probe forces the whole retrieval chain to one
        # dtype; the fitted map's device smear rides the same switch
        params['compute_dtype'] = getattr(losresult, 'compute_dtype', None)

    # one restore per file: the vmax scan and the distribution pass reuse
    # the same deserialized Outputs (full-array restores dominate
    # source-map cost on multi-GB stores; only X0 is binned, so the X
    # frame — the store's bulk — is skipped entirely)
    outputs = [Output.restore(f, columns={'X0': None})
               for f in losresult.modelfiles]

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
