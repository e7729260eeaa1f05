"""Constant-step throughput by radiation-pressure stage-evaluation mode.

Measures the bench.py Ca workload (2^20 packets, 360 steps) under the
three EngineSpec.radpres_per_stage strategies:

  True      exact per-stage relu lookup (6 knot walks per step; the
            round-2 parity mode)
  'tangent' one shared knot walk per step returning f and f'; stages
            reconstructed first-order (ops/pltable.pl_lookup_with_slope)
  False     frozen pre-step lookup reused across stages

Usage: python scripts/bench_radpres_modes.py [--packets 1048576] [--reps 3]
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=1 << 20)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nexoclom_tpu.atomicdata import radpres_table
    from nexoclom_tpu.initial_state.loss_info import LossInfo
    from nexoclom_tpu.ops.integrator import (EngineSpec, constant_step_driver,
                                             empty_force_table)
    from nexoclom_tpu.ops.pltable import compress_uniform
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source
    from nexoclom_tpu.solarsystem import SSObject, planet_dist

    dtype = jnp.float32
    mercury = SSObject('Mercury')
    radius_km = mercury.radius
    aplanet, vr = planet_dist(mercury, 0.0)
    v0, dv, accel = radpres_table('Ca', aplanet)
    forces = empty_force_table(dtype)._replace(
        gm=jnp.asarray(mercury.gm_rp3, dtype),
        vrplanet=jnp.asarray(vr / radius_km, dtype),
        rp_v0=jnp.asarray(v0 / radius_km, dtype),
        rp_dv=jnp.asarray(dv / radius_km, dtype),
        rp_accel=jnp.asarray(accel / radius_km, dtype),
        rp_pl=compress_uniform(v0 / radius_km, dv / radius_km,
                               accel / radius_km, rel_tol=1e-3,
                               dtype=np.float32),
        ion_rate=jnp.asarray(LossInfo('Ca', 0.0, aplanet).photo, dtype))

    n = args.packets
    step_size, endtime = 30.0, 10800.0
    nsteps = int(math.ceil(endtime / step_size + 1))
    key = jax.random.PRNGKey(0)
    state0 = sample_uniform_flat_source(
        key, n, vprob=2.5 / radius_km, delv=1.5 / radius_km,
        endtime=endtime, dtype=dtype)
    float(jnp.sum(state0.frac))

    totals = {}
    for mode in (True, 'tangent', False):
        spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                          surface_bounce=False, check_outer_edge=True,
                          lookup_impl='relu', radpres_per_stage=mode)

        def run():
            final, _ = constant_step_driver(
                state0, spec, forces, None, jnp.asarray(step_size, dtype),
                jnp.asarray(15.0, dtype), jnp.asarray(radius_km, dtype),
                key, nsteps=nsteps, save_history=False)
            return final

        t0 = time.perf_counter()
        warm = run()
        totals[mode] = float(jnp.sum(warm.frac))
        print(f'{mode!s:8} compile+first: {time.perf_counter() - t0:.1f} s')
        t0 = time.perf_counter()
        check = 0.0
        for _ in range(args.reps):
            check += float(jnp.sum(run().frac))
        dt = time.perf_counter() - t0
        assert np.isfinite(check)
        rate = args.reps * n * (nsteps - 1) / dt
        print(f'{mode!s:8} {rate:.3e} packet-steps/s '
              f'(total frac {totals[mode]:.6e})')
    ref = totals[True]
    for mode in ('tangent', False):
        print(f'total-frac rel deviation {mode!s}: '
              f'{abs(totals[mode] - ref) / ref:.2e}')


if __name__ == '__main__':
    main()
