"""LOS-pipeline throughput: spectra x packets cone reductions per second.

The MESSENGER-orbit configuration in BASELINE.json is ~1e3 spectra against
1e6+ packet snapshots. This measures the device cone-reduction kernel
(ops/los.los_reduce) at that scale.

Usage: python scripts/bench_los.py [--spectra 1024] [--packets 1048576]
       [--cpu] [--culled 4096,8192,16384] [--orbit]

``--culled`` also times ops.los.los_reduce_culled (two-stage block cull,
the KDTree-prefilter role) at each listed block size and reports the
speedup over the dense kernel plus the result checksum (must match).
``--orbit`` swaps the synthetic ring geometry for the vendored
MESSENGER-like orbit fixture (real limb-scan cones, tiled to --spectra)
against an r^-2 exosphere cloud — the sparse-cone case the cull targets.
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--spectra', type=int, default=1024)
    parser.add_argument('--packets', type=int, default=1 << 20)
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--chunk', type=int, default=None,
                        help='spectra per scan step (default ops.los._CHUNK)')
    parser.add_argument('--culled', default=None,
                        help='comma list of cull block sizes to time')
    parser.add_argument('--walk-groups', default='1',
                        help='comma list of tiles-per-trip values timed '
                             'at each cull block size')
    parser.add_argument('--walk-all', action='store_true',
                        help='also time the cull with the sphere test '
                             'bypassed (walk every tile): the tile-walk '
                             'overhead roofline vs the dense kernel')
    parser.add_argument('--inner-reps', type=int, default=1,
                        help='kernel calls per dispatch (lax.scan inside '
                             'ONE jit): isolates true kernel cost from '
                             'the ~25 ms per-dispatch round trip on the '
                             'axon tunnel; the carry perturbs dphi by an '
                             'exact runtime zero so XLA cannot hoist the '
                             'loop body')
    parser.add_argument('--orbit', action='store_true',
                        help='MESSENGER-like orbit fixture geometry + '
                             'r^-2 exosphere cloud')
    args = parser.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nexoclom_tpu.ops.los import los_geometry, los_reduce

    rng = np.random.default_rng(0)
    n, S = args.packets, args.spectra
    if args.orbit:
        # r^-2 shell density out to 8 R_p (uniform-in-radius sampling),
        # isotropic directions — the generic exosphere shape
        r = rng.uniform(1.05, 8.0, n)
        costh = rng.uniform(-1, 1, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        sinth = np.sqrt(1 - costh ** 2)
        px = (r * sinth * np.cos(phi)).astype(np.float32)
        py = (r * sinth * np.sin(phi)).astype(np.float32)
        pz = (r * costh).astype(np.float32)
        w = rng.random(n).astype(np.float32)
        import pandas as pd
        orbit = pd.read_csv(os.path.join(
            os.path.dirname(__file__), '..', 'tests', 'data', 'orbits',
            'messenger_like_orbit.csv'))
        sc0 = orbit[['x', 'y', 'z']].to_numpy(float)
        b0 = orbit[['xbore', 'ybore', 'zbore']].to_numpy(float)
        reps_orbit = -(-S // len(sc0))
        sc = np.tile(sc0, (reps_orbit, 1))[:S]
        bore = np.tile(b0, (reps_orbit, 1))[:S]
    else:
        px = rng.normal(0, 3, n).astype(np.float32)
        py = rng.normal(0, 3, n).astype(np.float32)
        pz = rng.normal(0, 3, n).astype(np.float32)
        w = rng.random(n).astype(np.float32)

        theta = rng.uniform(0, 2 * np.pi, S)
        sc = np.stack([8 * np.cos(theta), 8 * np.sin(theta),
                       rng.uniform(-1, 1, S)], 1)
        bore = -sc + rng.normal(0, 0.5, (S, 3))
        bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, dd = los_geometry(sc, bore, 30.0)

    fn_args = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
               jnp.asarray(w), jnp.asarray(sc, jnp.float32),
               jnp.asarray(bore, jnp.float32),
               jnp.asarray(obstruction, jnp.float32),
               jnp.asarray(dd, jnp.float32))
    dphi = math.radians(1.0)
    rp_cm = 2440.53e5

    kw = {} if args.chunk is None else {'chunk': args.chunk}
    R = args.inner_reps

    def timed_kernel(kernel_fn):
        """Best-of-3 per-call seconds; with --inner-reps R > 1 each
        timed dispatch scans R kernel calls inside ONE dispatch via the
        shared helper (same methodology as bench.py's LOS stage)."""
        if R > 1:
            from nexoclom_tpu.utilities.tracing import scan_kernel_seconds
            return scan_kernel_seconds(kernel_fn, dphi, length=R, reps=3)
        run = lambda: jnp.sum(kernel_fn(dphi)[0])
        float(run())                        # compile + barrier
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best

    rad, npack, used = los_reduce(*fn_args, dphi, rp_cm, **kw)
    checksum = float(jnp.sum(rad))          # compile + barrier

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        rad, npack, used = los_reduce(*fn_args, dphi, rp_cm, **kw)
        checksum += float(jnp.sum(rad))
    elapsed = (time.perf_counter() - t0) / reps
    if R > 1:
        elapsed = timed_kernel(
            lambda dp: los_reduce(*fn_args, dp, rp_cm, **kw))
        print(f'dense (inner-reps {R}): {elapsed:.4f} s/call '
              f'-> {S * n / elapsed:.3e} pairs/s dispatch-free')

    pairs = S * n
    print(f'backend = {jax.default_backend()}')
    print(f'{S} spectra x {n} packets = {pairs:.3e} pairs in '
          f'{elapsed:.3f} s -> {pairs / elapsed:.3e} pairs/s '
          f'({S / elapsed:.1f} spectra/s at 1M packets)')
    print(f'in-view packets total = {int(jnp.sum(npack))}, '
          f'checksum = {checksum:.3e}')

    if args.culled:
        from nexoclom_tpu.ops.los import los_reduce_culled
        dense_rad = np.asarray(rad, np.float64)
        groups = [int(g) for g in args.walk_groups.split(',')]
        for blk in (int(b) for b in args.culled.split(',')):
            # survivor stats once per block (separate compile; untimed)
            _, _, _, ks = los_reduce_culled(*fn_args, dphi, rp_cm,
                                            block=blk,
                                            return_tile_counts=True, **kw)
            ks = np.asarray(ks)
            nblocks = -(-n // blk)
            print(f'block={blk:6d}: surviving tiles/chunk '
                  f'mean {ks.mean():.1f} / {nblocks} '
                  f'({ks.mean() / nblocks:.3f} frac; '
                  f'min {ks.min()}, max {ks.max()}) '
                  f'-> geometric ideal {nblocks / max(ks.mean(), 1):.2f}x')
            variants = [(g, False) for g in groups]
            if args.walk_all:
                variants.append((max(groups), True))
            for grp, wall in variants:
                tag = 'walk-ALL' if wall else f'group={grp}'
                run = lambda: los_reduce_culled(
                    *fn_args, dphi, rp_cm, block=blk, walk_group=grp,
                    walk_all=wall, **kw)
                rad_c, npack_c, _ = run()
                float(jnp.sum(rad_c))           # compile + barrier
                t0 = time.perf_counter()
                for _ in range(reps):
                    rad_c, npack_c, _ = run()
                    float(jnp.sum(rad_c))
                dt = (time.perf_counter() - t0) / reps
                if R > 1:
                    dt = timed_kernel(
                        lambda dp, b=blk, g=grp, w=wall: los_reduce_culled(
                            *fn_args, dp, rp_cm, block=b, walk_group=g,
                            walk_all=w, **kw))
                    tag += f' (inner-reps {R}, dispatch-free)'
                rel = (np.abs(np.asarray(rad_c, np.float64)
                              - dense_rad).max()
                       / max(dense_rad.max(), 1e-30))
                print(f'culled block={blk:6d} {tag}: {dt:.3f} s -> '
                      f'{pairs / dt:.3e} pairs/s nominal '
                      f'({elapsed / dt:.2f}x dense), max rel diff '
                      f'{rel:.1e}, npack equal='
                      f'{bool((np.asarray(npack_c) == np.asarray(npack)).all())}')


if __name__ == '__main__':
    main()
