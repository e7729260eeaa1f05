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


@partial(jax.jit, static_argnames=('chunk', 'block', 'walk_group'))
def _density_reduce_culled(px, py, pz, frac, qx, qy, qz, dr,
                           chunk: int = 128, block: int = 8192,
                           walk_group: int = 1):
    """Ball-query form of the two-stage block cull (``ops/los.py``):
    Morton-sort packets once, bound blocks with spheres, walk only the
    blocks whose sphere comes within ``dr`` of any probe point in the
    chunk (probes are also Morton-reordered so chunks are compact) —
    exact: culled blocks contribute zero to every probe's ball sum.
    The per-probe ball (dr ~ 0.05 R_p) is tiny against the cloud, so
    the cull is much sharper than the LOS cone case."""
    from nexoclom_tpu.ops.los import _morton_key

    n = px.shape[0]
    padn = (-n) % block
    if padn:
        nanpad = jnp.full(padn, jnp.nan, px.dtype)
        px = jnp.concatenate([px, nanpad])
        py = jnp.concatenate([py, nanpad])
        pz = jnp.concatenate([pz, nanpad])
        frac = jnp.concatenate([frac, jnp.zeros(padn, frac.dtype)])
    n_pad = n + padn
    nblocks = n_pad // block

    key = _morton_key(px, py, pz)
    _, px_s, py_s, pz_s, f_s = jax.lax.sort(
        (key, px, py, pz, frac), num_keys=1, is_stable=True)

    def blk(v):
        return v.reshape(nblocks, block)

    bxl, bxh = jnp.nanmin(blk(px_s), 1), jnp.nanmax(blk(px_s), 1)
    byl, byh = jnp.nanmin(blk(py_s), 1), jnp.nanmax(blk(py_s), 1)
    bzl, bzh = jnp.nanmin(blk(pz_s), 1), jnp.nanmax(blk(pz_s), 1)
    cx, cy, cz = (bxl + bxh) / 2, (byl + byh) / 2, (bzl + bzh) / 2
    br = 0.5 * jnp.sqrt((bxh - bxl) ** 2 + (byh - byl) ** 2
                        + (bzh - bzl) ** 2)

    npts = qx.shape[0]
    skey = _morton_key(qx, qy, qz)
    siota = jnp.arange(npts, dtype=jnp.int32)
    _, qx_s, qy_s, qz_s, qperm = jax.lax.sort(
        (skey, qx, qy, qz, siota), num_keys=1, is_stable=True)
    pad = (-npts) % chunk
    qx_s = jnp.concatenate([qx_s, jnp.full(pad, jnp.nan, qx.dtype)])
    qy_s = jnp.concatenate([qy_s, jnp.zeros(pad, qy.dtype)])
    qz_s = jnp.concatenate([qz_s, jnp.zeros(pad, qz.dtype)])
    nchunks = (npts + pad) // chunk

    iota_b = jnp.arange(nblocks, dtype=jnp.int32)

    def ball_test(x0, y0, z0):
        d = jnp.sqrt((cx - x0) ** 2 + (cy - y0) ** 2 + (cz - z0) ** 2)
        return d <= br + dr

    def one_point(x0, y0, z0, pxt, pyt, pzt, ft):
        d2 = (pxt - x0) ** 2 + (pyt - y0) ** 2 + (pzt - z0) ** 2
        near = d2 <= dr * dr
        return jnp.sum(jnp.where(near, ft, 0.0)), jnp.sum(near)

    tile_vmap = jax.vmap(one_point,
                         in_axes=(0, 0, 0, None, None, None, None))

    def body(_, args):
        x0, y0, z0 = args
        pred = jnp.any(jax.vmap(ball_test)(x0, y0, z0), axis=0)
        k = jnp.sum(pred)
        order = jnp.sort(jnp.where(pred, iota_b, nblocks))

        ntrips = -(-k // walk_group)

        def tile_cond(c):
            return c[0] < ntrips

        def tile_body(c):
            t, dens_c, count_c = c
            # walk_group tiles per trip (round-5 LOS-cull lever); masked
            # past-k slots contribute exact zeros
            for g in range(walk_group):
                j = t * walk_group + g
                valid = j < k
                bid = order[jnp.minimum(j, nblocks - 1)]
                off = jnp.where(valid, bid, 0) * block
                pxt = jax.lax.dynamic_slice_in_dim(px_s, off, block)
                pyt = jax.lax.dynamic_slice_in_dim(py_s, off, block)
                pzt = jax.lax.dynamic_slice_in_dim(pz_s, off, block)
                ft = jax.lax.dynamic_slice_in_dim(f_s, off, block)
                d_t, c_t = tile_vmap(x0, y0, z0, pxt, pyt, pzt, ft)
                dens_c = dens_c + jnp.where(valid, d_t, 0.0)
                count_c = count_c + jnp.where(valid, c_t,
                                              0).astype(count_c.dtype)
            return t + 1, dens_c, count_c

        _, dens, count = jax.lax.while_loop(
            tile_cond, tile_body,
            (jnp.asarray(0, k.dtype), jnp.zeros(chunk, px.dtype),
             jnp.zeros(chunk, jnp.int32)))
        return None, (dens, count)

    _, (dens, count) = jax.lax.scan(
        body, None, (qx_s.reshape(nchunks, chunk),
                     qy_s.reshape(nchunks, chunk),
                     qz_s.reshape(nchunks, chunk)))
    dens_out = jnp.zeros(npts, dens.dtype).at[qperm].set(
        dens.reshape(-1)[:npts])
    count_out = jnp.zeros(npts, jnp.int32).at[qperm].set(
        count.reshape(-1)[:npts])
    return dens_out, count_out


@partial(jax.jit, static_argnames=('chunk', 'block', 'mesh'))
def _density_culled_sharded_fn(px, py, pz, frac, qx, qy, qz, dr,
                               chunk, block, mesh):
    p_pack = jax.sharding.PartitionSpec('packets')
    p_rep = jax.sharding.PartitionSpec()

    def shard_body(pxl, pyl, pzl, fl, qxl, qyl, qzl, drl):
        dens, count = _density_reduce_culled(pxl, pyl, pzl, fl,
                                             qxl, qyl, qzl, drl,
                                             chunk=chunk, block=block)
        return (jax.lax.psum(dens, 'packets'),
                jax.lax.psum(count, 'packets'))

    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(p_pack,) * 4 + (p_rep,) * 4,
        out_specs=(p_rep, p_rep), check_vma=False)(
        px, py, pz, frac, qx, qy, qz, dr)


def _density_reduce_culled_sharded(px, py, pz, frac, qx, qy, qz, dr,
                                   mesh, chunk: int = 128,
                                   block: int = 8192):
    """:func:`_density_reduce_culled` over a packet-sharded mesh — the
    :func:`nexoclom_tpu.ops.los.los_reduce_culled_sharded` pattern:
    per-shard Morton sorts and tile walks, one psum pair joining the
    per-probe sums.  Packet arrays must be pre-padded/placed
    (``shard_padded``; NaN position pads fail every ball test)."""
    return _density_culled_sharded_fn(
        px, py, pz, frac, jnp.asarray(qx), jnp.asarray(qy),
        jnp.asarray(qz), jnp.asarray(dr, px.dtype), chunk, block, mesh)


class ModelDensity:
    def __init__(self, inputs, xpts, ypts, zpts, dr=0.05,
                 true_volume=False, sharded=False, cull_block='auto'):
        self.type = 'density'
        # same flagship switch as the other observables: shard the packet
        # axis of the per-point reductions over local devices
        self.sharded = sharded
        # ball-query form of the LOS block cull (exact); dr is tiny
        # against the cloud so most packet tiles are skipped — measured
        # 13.4x at block 2048 even on CPU (docs/scaling.md), so 'auto'
        # culls on EVERY backend (unlike the cone kernels, whose CPU
        # dense form wins).  Explicit 0 forces dense.
        from nexoclom_tpu.ops.los import resolve_cull_block
        self.cull_block = resolve_cull_block(
            cull_block, accel_default=2048, cpu_default=2048)
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
            # the ball query reads only positions and weights; skip the
            # rest of the frame (restore cost is per-column)
            output = Output.restore(
                fname, columns={'X': ('x', 'y', 'z', 'frac')})
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
            if self.cull_block and mesh is None:
                dens, count = _density_reduce_culled(
                    *packet_arrays, *probe_args, block=self.cull_block)
            elif self.cull_block and mesh is not None:
                # NaN position pads fail every ball test (inert rows)
                packet_arrays, _ = shard_padded(
                    mesh, packet_arrays, (np.nan, 0.0, 0.0, 0.0))
                dens, count = _density_reduce_culled_sharded(
                    *packet_arrays, *probe_args, mesh,
                    block=self.cull_block)
            elif mesh is not None:
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
