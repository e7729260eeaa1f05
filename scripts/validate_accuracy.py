"""Accuracy validation: float32 (TPU) vs float64 brightness parity.

BASELINE.json's accuracy north-star is Ca brightness within 1% of the
reference model. The reference computes in float64; this build's TPU path
runs float32. This script bounds the float32 error on the Ca parity case by
comparing fused radiance images computed with identical threefry streams.

Modes:

  python scripts/validate_accuracy.py
      CPU: f64 vs f32 on the same backend (pure precision effect).

  python scripts/validate_accuracy.py --save-ref /tmp/ca_ref.npz
      CPU f64 run saved to disk.

  python scripts/validate_accuracy.py --tpu --compare /tmp/ca_ref.npz
      TPU f32 run compared against the saved CPU f64 reference
      (precision + backend effects combined).

Reported metrics: relative difference of disk-integrated brightness (the
target metric) and the p95 per-pixel relative difference over the top-half
signal (dominated by MC pixel migration, informational only).

Measured (20k packets, Ca.spot, 2026-08): CPU f32 vs f64 total brightness
0.34% — inside the 1% target.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

PARAMS = {'quantity': 'radiance', 'dims': '64,64', 'width': '8,8'}
SEED = 20260816


def run_case(dtype_name, npackets):
    import jax.numpy as jnp
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    dtype = jnp.float64 if dtype_name == 'float64' else jnp.float32
    inputs = Input(os.path.join(os.path.dirname(__file__), '..', 'tests',
                                'data', 'inputfiles', 'mercury_ca_spot.input'))
    return fused_image_run(inputs, npackets, dict(PARAMS), seed=SEED,
                           dtype=dtype).image


def compare(name, image_a, image_b, target=0.01):
    import numpy as np
    rel_total = abs(image_a.sum() - image_b.sum()) / image_b.sum()
    strong = image_b >= np.percentile(image_b[image_b > 0], 50)
    rel_pix = np.abs(image_a[strong] - image_b[strong]) / image_b[strong]
    verdict = 'PASS' if rel_total < target else 'FAIL'
    print(f'{name}: total-brightness rel diff = {rel_total:.2e} '
          f'(target < {target}) -> {verdict}; '
          f'p95 per-pixel = {np.percentile(rel_pix, 95):.2e}')
    return rel_total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--npackets', type=int, default=20000)
    parser.add_argument('--tpu', action='store_true')
    parser.add_argument('--save-ref')
    parser.add_argument('--compare')
    args = parser.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)
    print('backend:', jax.default_backend())

    if args.save_ref:
        np.savez(args.save_ref, image=run_case('float64', args.npackets))
        print(f'saved f64 reference to {args.save_ref}')
        return

    if args.compare:
        ref = np.load(args.compare)['image']
        img32 = run_case('float32', args.npackets)
        compare(f'{jax.default_backend()} f32 vs saved f64', img32, ref)
        return

    img64 = run_case('float64', args.npackets)
    img32 = run_case('float32', args.npackets)
    compare('f32 vs f64 (same backend)', img32, img64)


if __name__ == '__main__':
    main()
