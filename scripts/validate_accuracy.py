"""Accuracy validation: float32 (TPU) vs float64 brightness parity.

BASELINE.json's accuracy north-star is Ca brightness within 1% of the
reference model. The reference computes in float64; this build's TPU path
runs float32. This script bounds the float32 error on the Ca parity case by
comparing fused radiance images computed with identical threefry streams:

  1. f64 vs f32 on the same backend     -> pure precision effect
  2. CPU f32 vs TPU f32 (if available)  -> pure backend effect

Reported metric: relative difference of total disk-integrated brightness and
the 95th-percentile relative per-pixel difference over pixels holding the
top 50% of the signal.

Run:  python scripts/validate_accuracy.py [--tpu] [--npackets N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build_inputs():
    from nexoclom_tpu.initial_state import Input
    inputs = Input(os.path.join(os.path.dirname(__file__), '..', 'tests',
                                'data', 'inputfiles', 'Ca.spot.input'))
    return inputs


def run_case(dtype_name, npackets, seed):
    import jax.numpy as jnp
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    dtype = jnp.float64 if dtype_name == 'float64' else jnp.float32
    inputs = build_inputs()
    params = {'quantity': 'radiance', 'dims': '64,64', 'width': '8,8'}
    result = fused_image_run(inputs, npackets, params, seed=seed,
                             dtype=dtype)
    return result.image


def compare(name, image_a, image_b):
    import numpy as np
    total_a, total_b = image_a.sum(), image_b.sum()
    rel_total = abs(total_a - total_b) / total_b
    strong = image_b >= np.percentile(image_b[image_b > 0], 50)
    rel_pix = np.abs(image_a[strong] - image_b[strong]) / image_b[strong]
    p95 = np.percentile(rel_pix, 95)
    print(f'{name}: total brightness rel diff = {rel_total:.2e}; '
          f'p95 per-pixel rel diff (top-half signal) = {p95:.2e}')
    return rel_total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--npackets', type=int, default=20000)
    parser.add_argument('--tpu', action='store_true',
                        help='also compare against the TPU backend (f32)')
    args = parser.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    print('backend:', jax.default_backend())

    seed = 20260816
    img64 = run_case('float64', args.npackets, seed)
    img32 = run_case('float32', args.npackets, seed)
    rel = compare('f32 vs f64 (same backend)', img32, img64)
    target = 0.01
    verdict = 'PASS' if rel < target else 'FAIL'
    print(f'precision effect on total Ca brightness: {rel:.2e} '
          f'(target < {target}) -> {verdict}')


if __name__ == '__main__':
    main()
