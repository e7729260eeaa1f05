"""Fused-observable throughput benchmark (real TPU).

Measures packet-steps/s for the Input-driven fused image pipeline
(`particle_tracking/fused.py`) across image sizes, histogram impls, and
snapshot strides — the numbers behind docs/scaling.md's fused-mode table.

Usage: python scripts/bench_fused.py [--packets 1e7] [--quantity radiance]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=float, default=1e7)
    ap.add_argument('--quantity', default='radiance')
    ap.add_argument('--endtime', type=float, default=10800.0)
    args = ap.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.fused import fused_image_run

    here = os.path.dirname(os.path.abspath(__file__))
    inp = Input(os.path.join(here, '..', 'nexoclom_tpu', 'data',
                             'inputfiles', 'mercury_ca_spot.input'))
    inp.options.endtime = args.endtime
    nsteps = int(args.endtime / inp.options.step_size + 1)
    n = int(args.packets)

    cases = [
        ('200x200 stride1', dict(params={'quantity': args.quantity,
                                         'dims': '200,200', 'width': '8,8'})),
        ('200x200 stride4-staggered',
         dict(params={'quantity': args.quantity, 'dims': '200,200',
                      'width': '8,8'}, snapshot_stride=4)),
        ('800x800 stride1', dict(params={'quantity': args.quantity,
                                         'dims': '800,800', 'width': '8,8'})),
        ('800x800 stride4-staggered',
         dict(params={'quantity': args.quantity, 'dims': '800,800',
                      'width': '8,8'}, snapshot_stride=4)),
    ]
    chunk = 1 << 20
    n = max(chunk, n - n % chunk)   # whole chunks: one compiled graph
    for name, kw in cases:
        # warm: compile the chunk graph (and initial-state build) once
        t0 = time.perf_counter()
        warm = fused_image_run(inp, chunk, seed=1, chunk=chunk, **kw)
        float(warm.image.sum())               # device sync
        twarm = time.perf_counter() - t0
        t0 = time.perf_counter()
        result = fused_image_run(inp, n, seed=1, chunk=chunk, **kw)
        total = float(result.image.sum())     # device sync
        dt = time.perf_counter() - t0
        ps = n * (nsteps - 1) / dt
        print(f'{name}: {ps:.3e} packet-steps/s steady '
              f'({dt:.1f} s / {n} packets; warm+compile {twarm:.1f} s), '
              f'image total {total:.4e}')


if __name__ == '__main__':
    main()
