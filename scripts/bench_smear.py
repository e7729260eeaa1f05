"""Source-map smear benchmark: dense vs culled, scatter vs MXU histograms.

Measures the per-grid-point smeared statistics kernel
(``data_simulation/make_source_map.py``) at production geometry —
the reference computes the same six statistics per grid point in a
python loop over 16200 points (``make_source_map.py:108-160``).

Stages:

* ``culled-matmul``  — block cull + one-hot MXU histograms (the TPU
  'auto' route)
* ``culled-scatter`` — block cull + per-point scatter-add histograms
* ``dense``          — the exact chunked masked reduction (optionally
  reduced geometry via --dense-grid/--dense-packets; the full dense
  form is ~W x P x 3 serial scatter updates on TPU)

Timing: scalar-pull protocol (``float(jnp.sum(...))``) per CLAUDE.md —
``block_until_ready`` can lie on axon.
"""
import argparse
import time

import numpy as np


def _grid(nlon, nlat):
    lonc = (np.arange(nlon) + 0.5) * 2 * np.pi / nlon
    latc = -np.pi / 2 + (np.arange(nlat) + 0.5) * np.pi / nlat
    glat, glon = np.meshgrid(latc, lonc)
    rad = np.radians(10.0) * np.cos(glat.ravel())
    return glat.ravel(), glon.ravel(), rad


def _packets(n, seed=0):
    rng = np.random.default_rng(seed)
    half = n // 2
    lat = np.clip(np.concatenate([rng.normal(0.2, 0.15, half),
                                  rng.uniform(-np.pi / 2, np.pi / 2,
                                              n - half)]),
                  -np.pi / 2, np.pi / 2)
    lon = np.concatenate([rng.normal(4.7, 0.2, half) % (2 * np.pi),
                          rng.uniform(0, 2 * np.pi, n - half)])
    w = rng.random(n)
    return (lat, lon, w, w > 0.1, rng.uniform(0, 5, n),
            rng.uniform(0, np.pi / 2, n), rng.uniform(0, 2 * np.pi, n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=1 << 20)
    ap.add_argument('--grid', default='180,90')
    ap.add_argument('--blocks', default='4096,8192')
    ap.add_argument('--walk-groups', default='1',
                    help='tiles per while_loop trip, timed per block '
                         '(matmul impl only)')
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--dense-grid', default='36,18',
                    help='reduced grid for the dense anchor ("" skips)')
    ap.add_argument('--dense-packets', type=int, default=1 << 18)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from nexoclom_tpu.data_simulation.make_source_map import (
        _smeared_point_stats, _smeared_point_stats_culled)

    nlon, nlat = map(int, args.grid.split(','))
    glat, glon, rad = _grid(nlon, nlat)
    pk = _packets(args.packets)
    ja = lambda *xs: tuple(jnp.asarray(x) for x in xs)
    gargs = ja(glat, glon, rad)
    pargs = ja(*pk)
    stat_args = dict(vmax=5.0, nvelbins=100, naltbins=23, nazbins=45)
    npts = glat.size

    def timed(fn, label):
        out = fn()
        _ = float(jnp.sum(out[2]))          # compile + settle
        best = np.inf
        for _r in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            _ = float(jnp.sum(out[2]))
            best = min(best, time.perf_counter() - t0)
        rate = npts * args.packets / best
        print(f'{label}: {best:.3f} s  '
              f'({rate:.3e} point-packet pairs/s)')
        return best, out

    times = {}
    groups = [int(g) for g in args.walk_groups.split(',')]
    for block in map(int, args.blocks.split(',')):
        for grp in groups[1:]:
            timed(lambda b=block, g=grp: _smeared_point_stats_culled(
                *gargs, *pargs, **stat_args, block=b, hist_impl='matmul',
                walk_group=g),
                f'culled-matmul block={block} group={grp}')
        times[f'culled-matmul/{block}'], out_m = timed(
            lambda b=block: _smeared_point_stats_culled(
                *gargs, *pargs, **stat_args, block=b, hist_impl='matmul'),
            f'culled-matmul block={block}')
        times[f'culled-scatter/{block}'], out_s = timed(
            lambda b=block: _smeared_point_stats_culled(
                *gargs, *pargs, **stat_args, block=b, hist_impl='scatter'),
            f'culled-scatter block={block}')
        # hardware-side parity of the MXU one-hot histograms vs the
        # scatter path (the matmul route is CPU-parity-tested; this
        # catches any bf16 operand rounding on the real accelerator)
        for i, (m, s) in enumerate(zip(out_m, out_s)):
            m = np.asarray(m, np.float64)
            s = np.asarray(s, np.float64)
            scale = max(np.abs(s).max(), 1e-30)
            rel = np.abs(m - s).max() / scale
            # few-1e-6 is f32 summation-order (matmul accumulates in a
            # different order than scatter); bf16 operand rounding showed
            # as 1.4e-4 before the Precision.HIGHEST fix
            flag = '' if rel < 1e-5 else '  <-- DRIFT'
            print(f'  matmul-vs-scatter stat[{i}]: max rel {rel:.2e}{flag}')

    if args.dense_grid:
        dnlon, dnlat = map(int, args.dense_grid.split(','))
        dglat, dglon, drad = _grid(dnlon, dnlat)
        dgargs = ja(dglat, dglon, drad)
        dpargs = ja(*_packets(args.dense_packets))
        dnpts = dglat.size
        save_npts, save_n = npts, args.packets
        npts, args.packets = dnpts, args.dense_packets
        t_dense, _ = timed(lambda: _smeared_point_stats(
            *dgargs, *dpargs, **stat_args),
            f'dense {dnlon}x{dnlat} @ {args.dense_packets} pk (anchor)')
        npts, args.packets = save_npts, save_n
        dense_rate = dnpts * args.dense_packets / t_dense
        full_eq = npts * args.packets / dense_rate
        best_cull = min(v for k, v in times.items() if 'matmul' in k)
        print(f'dense-rate extrapolation to full geometry: {full_eq:.1f} s '
              f'-> culled speedup ~{full_eq / best_cull:.1f}x')


if __name__ == '__main__':
    main()
