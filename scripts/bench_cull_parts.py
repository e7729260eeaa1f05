"""Decompose the LOS block cull's FIXED per-call cost (round-5 ladder).

The round-5 TPU ladder (docs/scaling.md) shows the culled kernel at
block 4096 / walk_group 8 spends ~35 ms per call independent of how many
tiles survive — about half the dense kernel's whole runtime — while the
tile walk itself runs at better-than-dense efficiency.  This script
times the candidate components on the same 1M-packet workload:

  morton   _morton_key on 1M positions
  sort6    the 6-operand packet lax.sort (key, px, py, pz, w, iota)
  sort2    a 2-operand lax.sort (key, iota) — payload-width sensitivity
  bounds   per-block nanmin/nanmax bounding spheres
  scatter  the used-mask unsort (zeros.at[perm].set(used))
  pred     the (chunk x nblocks) sphere tests + per-chunk order sort

Usage: python scripts/bench_cull_parts.py [--packets 1048576]
           [--block 4096] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=1 << 20)
    ap.add_argument('--block', type=int, default=4096)
    ap.add_argument('--spectra', type=int, default=1024)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nexoclom_tpu.ops.los import _morton_key

    rng = np.random.default_rng(0)
    n, block = args.packets, args.block
    nblocks = n // block
    r = rng.uniform(1.05, 8.0, n)
    costh = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    sinth = np.sqrt(1 - costh ** 2)
    px = jnp.asarray((r * sinth * np.cos(phi)).astype(np.float32))
    py = jnp.asarray((r * sinth * np.sin(phi)).astype(np.float32))
    pz = jnp.asarray((r * costh).astype(np.float32))
    w = jnp.asarray(rng.random(n).astype(np.float32))
    iota = jnp.arange(n, dtype=jnp.int32)
    used = jnp.asarray(rng.random(n) > 0.5)

    def timed(label, fn, pull):
        out = fn()
        float(pull(out))                     # compile + barrier
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            float(pull(out))
            best = min(best, time.perf_counter() - t0)
        print(f'{label:8s}: {best * 1e3:7.2f} ms')
        return out, best

    key_fn = jax.jit(lambda a, b, c: _morton_key(a, b, c))
    (key,), t_key = timed('morton', lambda: (key_fn(px, py, pz),),
                          lambda o: jnp.sum(o[0]))

    sort6 = jax.jit(lambda *ops: jax.lax.sort(ops, num_keys=1,
                                              is_stable=True))
    out6, t6 = timed('sort6',
                     lambda: sort6(key, px, py, pz, w, iota),
                     lambda o: jnp.sum(o[1]))
    _, px_s, py_s, pz_s, w_s, perm = out6

    timed('sort2', lambda: sort6(key, iota), lambda o: jnp.sum(o[1]))

    def bounds():
        def blk(v):
            return v.reshape(nblocks, block)
        bxl, bxh = jnp.nanmin(blk(px_s), 1), jnp.nanmax(blk(px_s), 1)
        byl, byh = jnp.nanmin(blk(py_s), 1), jnp.nanmax(blk(py_s), 1)
        bzl, bzh = jnp.nanmin(blk(pz_s), 1), jnp.nanmax(blk(pz_s), 1)
        cx, cy, cz = (bxl + bxh) / 2, (byl + byh) / 2, (bzl + bzh) / 2
        br = 0.5 * jnp.sqrt((bxh - bxl) ** 2 + (byh - byl) ** 2
                            + (bzh - bzl) ** 2)
        return cx, cy, cz, br
    timed('bounds', jax.jit(bounds), lambda o: jnp.sum(o[3]))

    unsort = jax.jit(
        lambda u, p: jnp.zeros(n, bool).at[p].set(u))
    timed('scatter', lambda: (unsort(used, perm),),
          lambda o: jnp.sum(o[0]))

    # pred: chunk x nblocks sphere tests + per-chunk survivor sort
    cx, cy, cz, br = jax.jit(bounds)()
    sc = np.stack([8 * np.cos(np.linspace(0, 6, args.spectra)),
                   8 * np.sin(np.linspace(0, 6, args.spectra)),
                   np.linspace(-1, 1, args.spectra)], 1).astype(np.float32)
    bore = (-sc / np.linalg.norm(sc, axis=1, keepdims=True)).astype(
        np.float32)
    scj = jnp.asarray(sc).reshape(-1, 32, 3)
    bj = jnp.asarray(bore).reshape(-1, 32, 3)
    iota_b = jnp.arange(nblocks, dtype=jnp.int32)

    @jax.jit
    def pred_all(scc, bcc):
        def one_chunk(sck, bk):
            def sphere(s, b):
                rx, ry, rz = cx - s[0], cy - s[1], cz - s[2]
                d = jnp.sqrt(rx * rx + ry * ry + rz * rz)
                losrad = rx * b[0] + ry * b[1] + rz * b[2]
                cosang = jnp.clip(losrad / jnp.maximum(d, 1e-30), -1, 1)
                ang = jnp.arccos(cosang)
                dil = jnp.arcsin(jnp.clip(br / jnp.maximum(d, 1e-30), 0, 1))
                return (ang - dil <= 0.0175) | (d <= br)
            pred = jnp.any(jax.vmap(sphere)(sck, bk), axis=0)
            return jnp.sort(jnp.where(pred, iota_b, nblocks)), jnp.sum(pred)
        orders, ks = jax.vmap(one_chunk)(scc, bcc)
        return orders, ks
    timed('pred', lambda: pred_all(scj, bj), lambda o: jnp.sum(o[1]))


if __name__ == '__main__':
    main()
