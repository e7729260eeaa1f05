"""Batched line-of-sight radiance/column reduction.

TPU-native replacement for the reference's per-spectrum KDTree cone search
(``data_simulation/compute_iteration.py:90-240``): instead of pre-filtering
candidate packets with a tree and geometrically spaced sample points, every
(spectrum, packet) pair is evaluated as a masked reduction — O(S x N) vector
work that XLA tiles efficiently, processed in spectrum chunks inside a scan
to bound memory.  The physics of the inclusion test is identical:

* a packet contributes to a spectrum when its angular distance from the
  boresight is <= dphi and its projection along the boresight is closer than
  the planet-obstruction distance (``compute_iteration.py:185``);
* the projection must also lie within the outer-edge distance ``dd`` (the
  reference enforces this implicitly by only placing LOS sample points out to
  ``dd``, ``compute_iteration.py:163-168``);
* the contribution is weight / Apix with Apix = pi (d sin dphi)^2 in cm^2
  (``:194-196``);
* for radiance, packets whose LOS projection point is in shadow are dropped
  (``:202-206``).

The angular test uses cos(angle) >= cos(dphi) (equivalent to
arccos(angle) <= dphi, cheaper and NaN-free).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 32   # spectra evaluated concurrently; memory ~ _CHUNK x N floats
_WALK_GROUP = 8   # tiles per while_loop trip in the culled walk — the
                  # round-5 TPU ladder's best (1.35x -> 1.45x per-call,
                  # 1.24x -> 1.72x dispatch-free at block 4096 vs the
                  # dense kernel; docs/scaling.md round-5 cull ladder)


def resolve_cull_block(cull_block, accel_default: int = 4096,
                       cpu_default: int = 0):
    """Resolve a user cull_block setting to a concrete block size.

    ``None``/``'auto'`` pick the measured-best default for the backend:
    ``cpu_default`` (dense for the cone kernels, where the O(S x N)
    reduction is vector-parallel and the Morton sort is relatively
    costlier; 2048 for the density ball query, which wins even on CPU)
    and ``accel_default`` on accelerators (block 4096 measured best for
    the cone kernels, 2048 for the source-map smear and density —
    round-5 TPU ladders).  An explicit 0 forces the dense kernel; ints
    pass through.  Results are identical either way (the cull is
    exact).  Every family member's 'auto' routes through here so the
    next retune has one site to touch."""
    if cull_block in (None, 'auto'):
        return (cpu_default if jax.default_backend() == 'cpu'
                else accel_default)
    return int(cull_block or 0)


def _spectrum_kernel(px, py, pz, weight, sc, b, obstruct, dd,
                     cos_dphi, sin_dphi, rp_cm, radiance_mode: bool):
    """Contribution of every packet to one spectrum."""
    rx = px - sc[0]
    ry = py - sc[1]
    rz = pz - sc[2]
    d2 = rx * rx + ry * ry + rz * rz
    d = jnp.sqrt(jnp.maximum(d2, 1e-30))
    losrad = rx * b[0] + ry * b[1] + rz * b[2]
    cosang = jnp.clip(losrad / d, -1.0, 1.0)

    inview = (losrad < obstruct) & (cosang >= cos_dphi) & (losrad <= dd)

    apix = jnp.pi * (d * sin_dphi * rp_cm) ** 2
    w = jnp.where(inview, weight / apix, 0.0)

    if radiance_mode:
        hx = sc[0] + b[0] * losrad
        hy = sc[1] + b[1] * losrad
        hz = sc[2] + b[2] * losrad
        out_of_shadow = (hx * hx + hz * hz > 1.0) | (hy < 0.0)
        w = w * out_of_shadow

    return w.sum(), inview.sum(), (w > 0.0)


@partial(jax.jit, static_argnames=('quantity', 'chunk'))
def los_reduce(px, py, pz, weight,
               sc_pos, bore, obstruction, outer_dd,
               dphi, rp_cm, quantity: str = 'radiance',
               chunk: int = _CHUNK):
    """Radiance/column along every line of sight.

    Parameters
    ----------
    px, py, pz, weight : (N,) packet positions (R_p) and weights (frac, or
        frac * g / 1e6 per ``ModelResult.packet_weighting``)
    sc_pos : (S, 3) spacecraft positions (R_p)
    bore : (S, 3) unit boresight vectors
    obstruction : (S,) planet-occlusion distance cutoff (1e30 = none)
    outer_dd : (S,) distance from the spacecraft to the outer-edge sphere
    dphi : cone half-angle (radians)
    rp_cm : planetary radius in cm (Apix conversion)
    chunk : spectra evaluated concurrently (static); memory ~ chunk x N
        floats — knob for the throughput/HBM trade, default `_CHUNK`

    Returns
    -------
    radiance : (S,) summed weight / Apix per spectrum
    npackets : (S,) packets in view per spectrum
    used_any : (N,) True where the packet contributed with positive weight to
        any spectrum (the reference's ``included`` flags,
        ``compute_iteration.py:145,191``)
    """
    cos_dphi = jnp.cos(dphi)
    sin_dphi = jnp.sin(dphi)
    radiance_mode = quantity in ('radiance', 'difrad')

    n_spectra = sc_pos.shape[0]
    pad = (-n_spectra) % chunk
    # padded dummy spectra get dd = -1 so nothing is ever in view
    sc_pos = jnp.concatenate([sc_pos, jnp.zeros((pad, 3), sc_pos.dtype)])
    bore = jnp.concatenate([bore, jnp.zeros((pad, 3), bore.dtype)])
    bore = bore.at[n_spectra:, 0].set(1.0) if pad else bore
    obstruction = jnp.concatenate(
        [obstruction, jnp.zeros(pad, obstruction.dtype)])
    outer_dd = jnp.concatenate(
        [outer_dd, jnp.full(pad, -1.0, outer_dd.dtype)])

    nchunks = (n_spectra + pad) // chunk
    chunked = (sc_pos.reshape(nchunks, chunk, 3),
               bore.reshape(nchunks, chunk, 3),
               obstruction.reshape(nchunks, chunk),
               outer_dd.reshape(nchunks, chunk))

    kernel = jax.vmap(
        lambda sc, b, ob, dd: _spectrum_kernel(
            px, py, pz, weight, sc, b, ob, dd,
            cos_dphi, sin_dphi, rp_cm, radiance_mode))

    def body(used_any, operands):
        rad, npack, used = kernel(*operands)
        return used_any | jnp.any(used, axis=0), (rad, npack)

    used_any, (rad, npack) = jax.lax.scan(
        body, jnp.zeros(px.shape, bool), chunked)
    return (rad.reshape(-1)[:n_spectra], npack.reshape(-1)[:n_spectra],
            used_any)


def _morton_key(px, py, pz, bits: int = 10):
    """Interleaved-bit (Morton/Z-order) key from quantized positions.

    Packets NaN in any coordinate (the inert pad sentinel) get the maximum
    key so they sort to the end, keeping pad rows out of real blocks."""
    lo = jnp.stack([jnp.nanmin(px), jnp.nanmin(py), jnp.nanmin(pz)])
    hi = jnp.stack([jnp.nanmax(px), jnp.nanmax(py), jnp.nanmax(pz)])
    span = jnp.maximum(hi - lo, 1e-30)
    n_cells = (1 << bits) - 1

    def quant(v, k):
        q = (v - lo[k]) / span[k] * n_cells
        return jnp.clip(q, 0, n_cells).astype(jnp.int32)

    def spread(v):
        # space the low `bits` bits of v three apart (30-bit result)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    key = (spread(quant(px, 0)) | (spread(quant(py, 1)) << 1)
           | (spread(quant(pz, 2)) << 2))
    bad = jnp.isnan(px) | jnp.isnan(py) | jnp.isnan(pz)
    return jnp.where(bad, jnp.int32(2 ** 31 - 1), key)


@partial(jax.jit, static_argnames=('quantity', 'chunk', 'block',
                                   'walk_group', 'walk_all',
                                   'return_tile_counts'))
def los_reduce_culled(px, py, pz, weight,
                      sc_pos, bore, obstruction, outer_dd,
                      dphi, rp_cm, quantity: str = 'radiance',
                      chunk: int = _CHUNK, block: int = 8192,
                      walk_group: int = _WALK_GROUP,
                      walk_all: bool = False,
                      return_tile_counts: bool = False):
    """:func:`los_reduce` with a two-stage block cull — the TPU-native
    form of the reference's KDTree prefilter
    (``compute_iteration.py:171-173``), exact by construction.

    Stage 1 sorts packets by Morton code ONCE (one multi-operand
    ``lax.sort``; general gather is a scalar loop on this TPU, so
    spatial locality comes from sorting, not binning) and bounds each
    run of ``block`` sorted packets by a sphere.  Stage 2, per spectrum
    chunk, tests every block sphere against the chunk's cones — a dense
    (chunk x nblocks) test, conservative in the cone angle
    (``asin(r/d)`` dilation), the outer-edge distance, and the
    obstruction cutoff — and walks ONLY the passing blocks in a
    ``lax.while_loop``: each trip ``dynamic_slice``s one contiguous
    packet tile and runs the exact per-pair kernel on it.  Blocks that
    fail the conservative test contain no in-view packet for any
    spectrum in the chunk, so radiance, npackets, and the used mask are
    IDENTICAL to :func:`los_reduce` (up to per-spectrum f32/f64
    summation order across blocks).

    Wins when the cones are sparse against the packet cloud (a
    limb-scan orbit: dphi ~ 1 deg against an 8+ R_p exosphere);
    overhead is one sort + one unsort scatter of the used mask, each
    O(N) and amortised over all S spectra.  ``block`` trades cull
    granularity (smaller = tighter spheres, more culled) against
    per-tile loop overhead.

    The cull is chunk-granular — a block runs when ANY of the chunk's
    ``chunk`` spectra needs it — so SPECTRA are also reordered by the
    Morton code of each line's closest-approach point, making every
    chunk's cone bundle spatially tight (measured on the MESSENGER-like
    orbit: surviving tiles drop 0.60 -> 0.41 at block 8192).  Per-
    spectrum results are bit-identical under regrouping (culled-away
    tiles contribute exact zeros), and outputs are scattered back to
    the caller's spectrum order.

    ``walk_group`` — surviving tiles processed per while_loop trip
    (unrolled dynamic slices): amortises the loop's serial trip
    latency, which on this platform otherwise eats most of the
    geometric cull win (docs/scaling.md, round-5 cull ladder).  Trips
    past the survivor count are masked to exact zeros, so results stay
    identical for any group.  ``walk_all=True`` bypasses the sphere
    test and walks EVERY tile — the measurement roofline separating
    tile-walk overhead from cull selectivity.  ``return_tile_counts``
    appends a (nchunks,) per-chunk surviving-tile count to the outputs.
    """
    cos_dphi = jnp.cos(dphi)
    sin_dphi = jnp.sin(dphi)
    radiance_mode = quantity in ('radiance', 'difrad')
    n = px.shape[0]

    # ---- spectrum reorder: Morton key on the closest-approach point
    t_ca = jnp.clip(-jnp.sum(sc_pos * bore, axis=1), 0.0, outer_dd)
    anchor = sc_pos + bore * t_ca[:, None]
    skey = _morton_key(anchor[:, 0], anchor[:, 1], anchor[:, 2])
    siota = jnp.arange(sc_pos.shape[0], dtype=jnp.int32)
    (_, scx, scy, scz, bx, by, bz, obstruction, outer_dd,
     sperm) = jax.lax.sort(
        (skey, sc_pos[:, 0], sc_pos[:, 1], sc_pos[:, 2],
         bore[:, 0], bore[:, 1], bore[:, 2], obstruction, outer_dd,
         siota), num_keys=1, is_stable=True)
    sc_pos = jnp.stack([scx, scy, scz], axis=1)
    bore = jnp.stack([bx, by, bz], axis=1)

    # pad to a block multiple with the inert NaN sentinel (fails every
    # comparison in the kernel AND sorts to the end via the Morton key)
    padn = (-n) % block
    if padn:
        nanpad = jnp.full(padn, jnp.nan, px.dtype)
        px = jnp.concatenate([px, nanpad])
        py = jnp.concatenate([py, nanpad])
        pz = jnp.concatenate([pz, nanpad])
        weight = jnp.concatenate([weight, jnp.zeros(padn, weight.dtype)])
    n_pad = n + padn
    nblocks = n_pad // block

    key = _morton_key(px, py, pz)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    _, px_s, py_s, pz_s, w_s, perm = jax.lax.sort(
        (key, px, py, pz, weight, iota), num_keys=1, is_stable=True)

    # per-block bounding spheres (nan-aware: pad rows don't poison the
    # tail block's bounds)
    def blk(v):
        return v.reshape(nblocks, block)

    bxl, bxh = jnp.nanmin(blk(px_s), 1), jnp.nanmax(blk(px_s), 1)
    byl, byh = jnp.nanmin(blk(py_s), 1), jnp.nanmax(blk(py_s), 1)
    bzl, bzh = jnp.nanmin(blk(pz_s), 1), jnp.nanmax(blk(pz_s), 1)
    cx, cy, cz = (bxl + bxh) / 2, (byl + byh) / 2, (bzl + bzh) / 2
    br = 0.5 * jnp.sqrt((bxh - bxl) ** 2 + (byh - byl) ** 2
                        + (bzh - bzl) ** 2)
    # an all-NaN block (pure padding) gets radius 0 at a NaN center: the
    # cone test below evaluates False for it on every spectrum
    dphi_f = jnp.asarray(dphi, px.dtype)

    n_spectra = sc_pos.shape[0]
    pad_s = (-n_spectra) % chunk
    sc_pos = jnp.concatenate([sc_pos, jnp.zeros((pad_s, 3), sc_pos.dtype)])
    bore_pad = jnp.zeros((pad_s, 3), bore.dtype).at[:, 0].set(1.0)
    bore = jnp.concatenate([bore, bore_pad])
    obstruction = jnp.concatenate(
        [obstruction, jnp.zeros(pad_s, obstruction.dtype)])
    outer_dd = jnp.concatenate(
        [outer_dd, jnp.full(pad_s, -1.0, outer_dd.dtype)])
    nchunks = (n_spectra + pad_s) // chunk
    chunked = (sc_pos.reshape(nchunks, chunk, 3),
               bore.reshape(nchunks, chunk, 3),
               obstruction.reshape(nchunks, chunk),
               outer_dd.reshape(nchunks, chunk))

    iota_b = jnp.arange(nblocks, dtype=jnp.int32)

    def sphere_test(sc, b, obstruct, dd):
        # conservative: passes whenever ANY point of the block sphere
        # could pass the exact inview test for this spectrum
        rx = cx - sc[0]
        ry = cy - sc[1]
        rz = cz - sc[2]
        d = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        losrad = rx * b[0] + ry * b[1] + rz * b[2]
        cosang = jnp.clip(losrad / jnp.maximum(d, 1e-30), -1.0, 1.0)
        ang = jnp.arccos(cosang)
        dilate = jnp.arcsin(jnp.clip(br / jnp.maximum(d, 1e-30), 0.0, 1.0))
        in_cone = (ang - dilate <= dphi_f) | (d <= br)
        return (in_cone & (losrad - br < obstruct)
                & (losrad - br <= dd))

    def tile_kernel(sc, b, obstruct, dd, pxt, pyt, pzt, wt):
        return _spectrum_kernel(pxt, pyt, pzt, wt, sc, b, obstruct, dd,
                                cos_dphi, sin_dphi, rp_cm, radiance_mode)

    tile_vmap = jax.vmap(tile_kernel,
                         in_axes=(0, 0, 0, 0, None, None, None, None))

    def body(used_sorted, operands):
        sc, b, obstruct, dd = operands
        if walk_all:
            pred = jnp.ones(nblocks, bool)
        else:
            pred = jnp.any(
                jax.vmap(sphere_test)(sc, b, obstruct, dd), axis=0)
        k = jnp.sum(pred)
        order = jnp.sort(jnp.where(pred, iota_b, nblocks))
        ntrips = -(-k // walk_group)

        def tile_cond(c):
            return c[0] < ntrips

        def tile_body(c):
            t, rad_c, npack_c, used_c = c
            # walk_group tiles per trip, unrolled: masked past-k slots
            # contribute exact zeros (and re-read offset 0 harmlessly)
            for g in range(walk_group):
                j = t * walk_group + g
                valid = j < k
                bid = order[jnp.minimum(j, nblocks - 1)]
                off = jnp.where(valid, bid, 0) * block
                pxt = jax.lax.dynamic_slice_in_dim(px_s, off, block)
                pyt = jax.lax.dynamic_slice_in_dim(py_s, off, block)
                pzt = jax.lax.dynamic_slice_in_dim(pz_s, off, block)
                wt = jax.lax.dynamic_slice_in_dim(w_s, off, block)
                rad_t, npack_t, used_t = tile_vmap(sc, b, obstruct, dd,
                                                   pxt, pyt, pzt, wt)
                rad_c = rad_c + jnp.where(valid, rad_t, 0.0)
                npack_c = npack_c + jnp.where(
                    valid, npack_t, 0).astype(npack_c.dtype)
                old = jax.lax.dynamic_slice_in_dim(used_c, off, block)
                used_c = jax.lax.dynamic_update_slice_in_dim(
                    used_c, old | (jnp.any(used_t, axis=0) & valid),
                    off, 0)
            return (t + 1, rad_c, npack_c, used_c)

        _, rad, npack, used_sorted = jax.lax.while_loop(
            tile_cond, tile_body,
            (jnp.asarray(0, k.dtype), jnp.zeros(chunk, px.dtype),
             jnp.zeros(chunk, jnp.int32), used_sorted))
        return used_sorted, ((rad, npack, k) if return_tile_counts
                             else (rad, npack))

    used_sorted, out = jax.lax.scan(
        body, jnp.zeros(n_pad, bool), chunked)
    rad, npack = out[0], out[1]
    # unsort the used mask (scatter — one O(N) pass for the whole call)
    used_any = jnp.zeros(n_pad, bool).at[perm].set(used_sorted)[:n]
    # unsort the spectra back to the caller's order (S-sized scatter)
    rad = jnp.zeros(n_spectra, rad.dtype).at[sperm].set(
        rad.reshape(-1)[:n_spectra])
    npack = jnp.zeros(n_spectra, npack.dtype).at[sperm].set(
        npack.reshape(-1)[:n_spectra])
    if return_tile_counts:
        return rad, npack, used_any, out[2]
    return rad, npack, used_any


@partial(jax.jit, static_argnames=('quantity', 'chunk', 'block', 'mesh',
                                   'walk_group'))
def _culled_sharded_fn(px, py, pz, weight, sc_pos, bore, obstruction,
                       outer_dd, dphi, rp_cm, quantity, chunk, block, mesh,
                       walk_group=_WALK_GROUP):
    p_pack = jax.sharding.PartitionSpec('packets')
    p_rep = jax.sharding.PartitionSpec()

    def shard_body(pxl, pyl, pzl, wl, sc, b, ob, dd, dphi_l, rp_l):
        rad, npack, used = los_reduce_culled(
            pxl, pyl, pzl, wl, sc, b, ob, dd, dphi_l, rp_l,
            quantity=quantity, chunk=chunk, block=block,
            walk_group=walk_group)
        return (jax.lax.psum(rad, 'packets'),
                jax.lax.psum(npack, 'packets'), used)

    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(p_pack, p_pack, p_pack, p_pack,
                  p_rep, p_rep, p_rep, p_rep, p_rep, p_rep),
        out_specs=(p_rep, p_rep, p_pack), check_vma=False)(
        px, py, pz, weight, sc_pos, bore, obstruction, outer_dd,
        dphi, rp_cm)


def los_reduce_culled_sharded(px, py, pz, weight, sc_pos, bore,
                              obstruction, outer_dd, dphi, rp_cm, mesh,
                              quantity: str = 'radiance',
                              chunk: int = _CHUNK, block: int = 8192,
                              walk_group: int = _WALK_GROUP):
    """:func:`los_reduce_culled` over a packet-sharded mesh.

    Each device Morton-sorts, culls, and tile-walks ONLY its local
    packet shard under ``jax.shard_map`` — per-device while_loop trip
    counts diverge freely (the sharded-pool-loop pattern,
    ``ops/integrator.adaptive_pool_loop_sharded``) and the only
    collectives are one psum pair joining the per-spectrum sums.  The
    used mask stays shard-local and concatenates back to the global
    packet order.  Exact for the same reason as the single-device
    kernel: culled tiles contribute exact zeros.  Packet arrays must
    already be padded to a shard multiple and placed over the mesh's
    ``'packets'`` axis (``parallel.mesh.shard_padded`` with the inert
    NaN/0 sentinels).
    """
    return _culled_sharded_fn(
        px, py, pz, weight,
        jnp.asarray(sc_pos), jnp.asarray(bore),
        jnp.asarray(obstruction), jnp.asarray(outer_dd),
        jnp.asarray(dphi, px.dtype), jnp.asarray(rp_cm, px.dtype),
        quantity, chunk, block, mesh, walk_group)


@partial(jax.jit, static_argnames=('n_x0', 'use_weight', 'chunk'))
def los_fitted_accumulate(px, py, pz, weight, x0_index,
                          sc_pos, bore, obstruction, outer_dd,
                          ratio, spec_mask, spec_sigma,
                          dphi, n_x0: int, use_weight: str | None = None,
                          chunk: int = _CHUNK):
    """Per-initial-packet weighted mean of data/model ratios.

    The fitted-source retrieval (``LOSResultFitted.py:136-183``) computes,
    for every initial packet i, f_i = sum_s(w_is ratio_s) / sum_s(w_is) over
    the spectra s that used any snapshot of packet i, where ratio_s =
    data_s / model_s and w_is is 1, 1/dist, 1/dist^2, or 2/sigma_s.  The
    reference loops spectra and python sets; here the used-mask is recomputed
    per spectrum chunk as in :func:`los_reduce` (radiance mode) and the
    contributions scatter-add over the X0 index.

    Returns ``(ratio_x_sigma, sigma_sum)`` with shape (n_x0,).
    """
    cos_dphi = jnp.cos(dphi)
    sin_dphi = jnp.sin(dphi)

    n_spectra = sc_pos.shape[0]
    pad = (-n_spectra) % chunk
    sc_pos = jnp.concatenate([sc_pos, jnp.zeros((pad, 3), sc_pos.dtype)])
    bore_pad = jnp.zeros((pad, 3), bore.dtype).at[:, 0].set(1.0)
    bore = jnp.concatenate([bore, bore_pad])
    obstruction = jnp.concatenate(
        [obstruction, jnp.zeros(pad, obstruction.dtype)])
    outer_dd = jnp.concatenate(
        [outer_dd, jnp.full(pad, -1.0, outer_dd.dtype)])
    ratio = jnp.concatenate([ratio, jnp.zeros(pad, ratio.dtype)])
    spec_mask = jnp.concatenate([spec_mask, jnp.zeros(pad, bool)])
    spec_sigma = jnp.concatenate([spec_sigma, jnp.ones(pad, spec_sigma.dtype)])

    nchunks = (n_spectra + pad) // chunk

    def one_spectrum(sc, b, obstruct, dd, rat, keep, sigma):
        rx = px - sc[0]
        ry = py - sc[1]
        rz = pz - sc[2]
        d2 = rx * rx + ry * ry + rz * rz
        d = jnp.sqrt(jnp.maximum(d2, 1e-30))
        losrad = rx * b[0] + ry * b[1] + rz * b[2]
        cosang = jnp.clip(losrad / d, -1.0, 1.0)
        inview = (losrad < obstruct) & (cosang >= cos_dphi) & (losrad <= dd)
        hx = sc[0] + b[0] * losrad
        hy = sc[1] + b[1] * losrad
        hz = sc[2] + b[2] * losrad
        out_of_shadow = (hx * hx + hz * hz > 1.0) | (hy < 0.0)
        used = inview & out_of_shadow & (weight > 0.0) & keep

        if use_weight == 'dist2':
            w = 1.0 / jnp.maximum(d2, 1e-30)
        elif use_weight == 'dist':
            w = 1.0 / d
        elif use_weight == 'sigma':
            # reference expression `1/spectrum.sigma*2` == 2/sigma
            w = jnp.full_like(d, 2.0 / sigma)
        else:
            w = jnp.ones_like(d)
        w = jnp.where(used, w, 0.0)
        return w * rat, w

    kernel = jax.vmap(one_spectrum)

    def body(carry, operands):
        rs, ss = carry
        contrib_ratio, contrib_w = kernel(*operands)
        # sum over the chunk's spectra, then scatter rows -> X0 index
        rs = rs.at[x0_index].add(contrib_ratio.sum(axis=0))
        ss = ss.at[x0_index].add(contrib_w.sum(axis=0))
        return (rs, ss), None

    chunked = tuple(a.reshape((nchunks, chunk) + a.shape[1:])
                    for a in (sc_pos, bore, obstruction, outer_dd,
                              ratio, spec_mask, spec_sigma))
    (ratio_x_sigma, sigma_sum), _ = jax.lax.scan(
        body, (jnp.zeros(n_x0, px.dtype), jnp.zeros(n_x0, px.dtype)),
        chunked)
    return ratio_x_sigma, sigma_sum


@partial(jax.jit, static_argnames=('n_x0', 'use_weight', 'chunk', 'block',
                                   'walk_group'))
def los_fitted_accumulate_culled(px, py, pz, weight, x0_index,
                                 sc_pos, bore, obstruction, outer_dd,
                                 ratio, spec_mask, spec_sigma,
                                 dphi, n_x0: int,
                                 use_weight: str | None = None,
                                 chunk: int = _CHUNK, block: int = 8192,
                                 walk_group: int = _WALK_GROUP):
    """:func:`los_fitted_accumulate` behind the two-stage block cull.

    Same Morton sort + bounding spheres + conservative cone test +
    while_loop tile walk as :func:`los_reduce_culled` (and the same
    spectrum reorder — the outputs are packet-indexed sums over ALL
    spectra, so no unsort is needed), with each surviving tile's
    (chunk x block) contributions scatter-added over the tile's X0
    indices.  A culled tile contains no used packet for any spectrum in
    the chunk, so its contributions are exact zeros — results equal the
    dense kernel up to f32/f64 summation order.
    """
    cos_dphi = jnp.cos(dphi)
    sin_dphi = jnp.sin(dphi)
    n = px.shape[0]

    # ---- spectrum reorder (closest-approach Morton key)
    t_ca = jnp.clip(-jnp.sum(sc_pos * bore, axis=1), 0.0, outer_dd)
    anchor = sc_pos + bore * t_ca[:, None]
    skey = _morton_key(anchor[:, 0], anchor[:, 1], anchor[:, 2])
    (_, scx, scy, scz, bx, by, bz, obstruction, outer_dd, ratio,
     spec_mask_f, spec_sigma) = jax.lax.sort(
        (skey, sc_pos[:, 0], sc_pos[:, 1], sc_pos[:, 2],
         bore[:, 0], bore[:, 1], bore[:, 2], obstruction, outer_dd,
         ratio, spec_mask.astype(jnp.float32), spec_sigma),
        num_keys=1, is_stable=True)
    sc_pos = jnp.stack([scx, scy, scz], axis=1)
    bore = jnp.stack([bx, by, bz], axis=1)
    spec_mask = spec_mask_f > 0.5

    # ---- packet pad + Morton sort (x0 rides along; pads scatter to 0
    # with zero weight)
    padn = (-n) % block
    if padn:
        nanpad = jnp.full(padn, jnp.nan, px.dtype)
        px = jnp.concatenate([px, nanpad])
        py = jnp.concatenate([py, nanpad])
        pz = jnp.concatenate([pz, nanpad])
        weight = jnp.concatenate([weight, jnp.zeros(padn, weight.dtype)])
        x0_index = jnp.concatenate(
            [x0_index, jnp.zeros(padn, x0_index.dtype)])
    n_pad = n + padn
    nblocks = n_pad // block

    key = _morton_key(px, py, pz)
    _, px_s, py_s, pz_s, w_s, x0_s = jax.lax.sort(
        (key, px, py, pz, weight, x0_index), num_keys=1, is_stable=True)

    def blk(v):
        return v.reshape(nblocks, block)

    bxl, bxh = jnp.nanmin(blk(px_s), 1), jnp.nanmax(blk(px_s), 1)
    byl, byh = jnp.nanmin(blk(py_s), 1), jnp.nanmax(blk(py_s), 1)
    bzl, bzh = jnp.nanmin(blk(pz_s), 1), jnp.nanmax(blk(pz_s), 1)
    cx, cy, cz = (bxl + bxh) / 2, (byl + byh) / 2, (bzl + bzh) / 2
    br = 0.5 * jnp.sqrt((bxh - bxl) ** 2 + (byh - byl) ** 2
                        + (bzh - bzl) ** 2)
    dphi_f = jnp.asarray(dphi, px.dtype)

    n_spectra = sc_pos.shape[0]
    pad_s = (-n_spectra) % chunk
    sc_pos = jnp.concatenate([sc_pos, jnp.zeros((pad_s, 3), sc_pos.dtype)])
    bore_pad = jnp.zeros((pad_s, 3), bore.dtype).at[:, 0].set(1.0)
    bore = jnp.concatenate([bore, bore_pad])
    obstruction = jnp.concatenate(
        [obstruction, jnp.zeros(pad_s, obstruction.dtype)])
    outer_dd = jnp.concatenate(
        [outer_dd, jnp.full(pad_s, -1.0, outer_dd.dtype)])
    ratio = jnp.concatenate([ratio, jnp.zeros(pad_s, ratio.dtype)])
    spec_mask = jnp.concatenate([spec_mask, jnp.zeros(pad_s, bool)])
    spec_sigma = jnp.concatenate(
        [spec_sigma, jnp.ones(pad_s, spec_sigma.dtype)])
    nchunks = (n_spectra + pad_s) // chunk
    chunked = tuple(a.reshape((nchunks, chunk) + a.shape[1:])
                    for a in (sc_pos, bore, obstruction, outer_dd,
                              ratio, spec_mask, spec_sigma))

    iota_b = jnp.arange(nblocks, dtype=jnp.int32)

    def sphere_test(sc, b, obstruct, dd):
        rx = cx - sc[0]
        ry = cy - sc[1]
        rz = cz - sc[2]
        d = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        losrad = rx * b[0] + ry * b[1] + rz * b[2]
        cosang = jnp.clip(losrad / jnp.maximum(d, 1e-30), -1.0, 1.0)
        ang = jnp.arccos(cosang)
        dilate = jnp.arcsin(jnp.clip(br / jnp.maximum(d, 1e-30), 0.0, 1.0))
        in_cone = (ang - dilate <= dphi_f) | (d <= br)
        return (in_cone & (losrad - br < obstruct)
                & (losrad - br <= dd))

    def one_spectrum(sc, b, obstruct, dd, rat, keep, sigma,
                     pxt, pyt, pzt, wt):
        rx = pxt - sc[0]
        ry = pyt - sc[1]
        rz = pzt - sc[2]
        d2 = rx * rx + ry * ry + rz * rz
        d = jnp.sqrt(jnp.maximum(d2, 1e-30))
        losrad = rx * b[0] + ry * b[1] + rz * b[2]
        cosang = jnp.clip(losrad / d, -1.0, 1.0)
        inview = (losrad < obstruct) & (cosang >= cos_dphi) & (losrad <= dd)
        hx = sc[0] + b[0] * losrad
        hy = sc[1] + b[1] * losrad
        hz = sc[2] + b[2] * losrad
        out_of_shadow = (hx * hx + hz * hz > 1.0) | (hy < 0.0)
        used = inview & out_of_shadow & (wt > 0.0) & keep

        if use_weight == 'dist2':
            w = 1.0 / jnp.maximum(d2, 1e-30)
        elif use_weight == 'dist':
            w = 1.0 / d
        elif use_weight == 'sigma':
            w = jnp.full_like(d, 2.0 / sigma)
        else:
            w = jnp.ones_like(d)
        w = jnp.where(used, w, 0.0)
        return w * rat, w

    tile_vmap = jax.vmap(one_spectrum,
                         in_axes=(0, 0, 0, 0, 0, 0, 0,
                                  None, None, None, None))

    def body(carry, operands):
        sc, b, obstruct, dd, rat, keep, sigma = operands
        pred = jnp.any(
            jax.vmap(sphere_test)(sc, b, obstruct, dd), axis=0)
        k = jnp.sum(pred)
        order = jnp.sort(jnp.where(pred, iota_b, nblocks))
        ntrips = -(-k // walk_group)

        def tile_cond(c):
            return c[0] < ntrips

        def tile_body(c):
            t, rs, ss = c
            for g in range(walk_group):
                j = t * walk_group + g
                valid = j < k
                bid = order[jnp.minimum(j, nblocks - 1)]
                off = jnp.where(valid, bid, 0) * block
                pxt = jax.lax.dynamic_slice_in_dim(px_s, off, block)
                pyt = jax.lax.dynamic_slice_in_dim(py_s, off, block)
                pzt = jax.lax.dynamic_slice_in_dim(pz_s, off, block)
                wt = jax.lax.dynamic_slice_in_dim(w_s, off, block)
                x0t = jax.lax.dynamic_slice_in_dim(x0_s, off, block)
                cr, cw = tile_vmap(sc, b, obstruct, dd, rat, keep, sigma,
                                   pxt, pyt, pzt, wt)
                # masked past-k slots scatter exact zeros to index x0t[0]
                rs = rs.at[x0t].add(jnp.where(valid, cr.sum(axis=0), 0.0))
                ss = ss.at[x0t].add(jnp.where(valid, cw.sum(axis=0), 0.0))
            return (t + 1, rs, ss)

        _, rs, ss = jax.lax.while_loop(
            tile_cond, tile_body, (jnp.asarray(0, k.dtype),) + carry)
        return (rs, ss), None

    (ratio_x_sigma, sigma_sum), _ = jax.lax.scan(
        body, (jnp.zeros(n_x0, px.dtype), jnp.zeros(n_x0, px.dtype)),
        chunked)
    return ratio_x_sigma, sigma_sum


@partial(jax.jit, static_argnames=('n_x0', 'use_weight', 'chunk', 'block',
                                   'mesh', 'walk_group'))
def _fitted_culled_sharded_fn(px, py, pz, weight, x0_index, sc_pos, bore,
                              obstruction, outer_dd, ratio, spec_mask,
                              spec_sigma, dphi, n_x0, use_weight, chunk,
                              block, mesh, walk_group=_WALK_GROUP):
    p_pack = jax.sharding.PartitionSpec('packets')
    p_rep = jax.sharding.PartitionSpec()

    def shard_body(pxl, pyl, pzl, wl, x0l, *rest):
        rs, ss = los_fitted_accumulate_culled(
            pxl, pyl, pzl, wl, x0l, *rest, n_x0=n_x0,
            use_weight=use_weight, chunk=chunk, block=block,
            walk_group=walk_group)
        return (jax.lax.psum(rs, 'packets'), jax.lax.psum(ss, 'packets'))

    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(p_pack,) * 5 + (p_rep,) * 8,
        out_specs=(p_rep, p_rep), check_vma=False)(
        px, py, pz, weight, x0_index, sc_pos, bore, obstruction,
        outer_dd, ratio, spec_mask, spec_sigma, dphi)


def los_fitted_accumulate_culled_sharded(px, py, pz, weight, x0_index,
                                         sc_pos, bore, obstruction,
                                         outer_dd, ratio, spec_mask,
                                         spec_sigma, dphi, n_x0: int, mesh,
                                         use_weight: str | None = None,
                                         chunk: int = _CHUNK,
                                         block: int = 8192,
                                         walk_group: int = _WALK_GROUP):
    """:func:`los_fitted_accumulate_culled` over a packet-sharded mesh:
    per-shard Morton sorts and tile walks, one psum pair joining the
    per-X0 sums (the :func:`los_reduce_culled_sharded` pattern).  Packet
    arrays must be pre-padded/placed (``shard_padded`` with NaN/0/0
    sentinels; pad rows scatter zero weight to index 0)."""
    return _fitted_culled_sharded_fn(
        px, py, pz, weight, x0_index,
        jnp.asarray(sc_pos), jnp.asarray(bore),
        jnp.asarray(obstruction), jnp.asarray(outer_dd),
        jnp.asarray(ratio), jnp.asarray(spec_mask),
        jnp.asarray(spec_sigma), jnp.asarray(dphi, px.dtype),
        n_x0, use_weight, chunk, block, mesh, walk_group)


def los_geometry(sc_pos, bore, outeredge, moons=()):
    """Per-spectrum geometric cutoffs (host-side numpy).

    Returns ``(obstruction, outer_dd)``:

    * ``obstruction``: distance from the spacecraft to the planet centre when
      the boresight intersects the planet's disk, else 1e30
      (``compute_iteration.py:104-115``);
    * ``outer_dd``: distance along the boresight to the outer-edge sphere
      (``compute_iteration.py:158-161``).

    ``moons`` — an iterable of ``(center, radius)`` spheres (every
    included moon at its observation-time phase,
    ``initial_state.satellites.moon_occultors``) that additionally occult
    the line of sight (the reference has no moon machinery at all).
    Unlike the planet's center-distance cutoff (kept for parity), the
    moon cutoffs are exact near-intersection distances.
    """
    sc_pos = np.asarray(sc_pos, dtype=float)
    bore = np.asarray(bore, dtype=float)
    dist = np.sqrt((sc_pos ** 2).sum(axis=1))
    cosang = np.clip(-(sc_pos * bore).sum(axis=1) / dist, -1.0, 1.0)
    ang = np.arccos(cosang)
    asize = np.arcsin(np.clip(1.0 / dist, -1.0, 1.0))
    # boresights that miss the planet's disk get no occlusion cutoff
    obstruction = np.where(ang > asize, 1e30, dist)

    for moon_center, moon_radius in moons:
        if moon_radius <= 0.0:
            continue
        rel = sc_pos - np.asarray(moon_center, dtype=float)[None, :]
        bm = 2.0 * (rel * bore).sum(axis=1)
        cm = (rel ** 2).sum(axis=1) - float(moon_radius) ** 2
        disc_m = bm * bm - 4.0 * cm
        t_near = (-bm - np.sqrt(np.maximum(disc_m, 0.0))) / 2.0
        moon_cut = np.where((disc_m > 0.0) & (t_near > 0.0), t_near, 1e30)
        obstruction = np.minimum(obstruction, moon_cut)

    b = 2.0 * (sc_pos * bore).sum(axis=1)
    c = (sc_pos ** 2).sum(axis=1) - float(outeredge) ** 2
    disc = np.maximum(b * b - 4.0 * c, 0.0)
    outer_dd = (-b + np.sqrt(disc)) / 2.0
    return obstruction, outer_dd
