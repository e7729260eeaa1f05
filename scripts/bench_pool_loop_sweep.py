"""Parameter sensitivity of adaptive_pool_loop (real TPU).

The in-loop refill has three knobs that trade swap overhead (sorts +
outer-loop boundary crossings of the pool/output carry) against lane
occupancy:

  swap_every      iterations between device-side refill checks
  refill_fraction swap quantum as a fraction of the batch
  inner_steps     adaptive iterations per inner-loop cond check

Each distinct (swap_every, quantum) pair is a separate XLA program
(fresh ~4 min compile on axon, persistent-cached after).  The monolithic
driver runs first to pin the accepted-step total that defines useful
work (identical physics, docs/scaling.md occupancy ladder).

Usage: python scripts/bench_pool_loop_sweep.py [--pool 16777216]
           [--packets 1048576] [--configs 64:0.25:4,256:0.25:4,64:0.5:4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=1 << 20)
    ap.add_argument('--pool', type=int, default=1 << 24)
    ap.add_argument('--resolution', type=float, default=1e-4)
    ap.add_argument('--endtime', type=float, default=10800.0)
    ap.add_argument('--configs', default='64:0.25:4,256:0.25:4,64:0.5:4')
    ap.add_argument('--anchor', action='store_true',
                    help='re-measure the FIRST config after the last: '
                         'pool-loop ms/iter drifts up to ~1.6x between '
                         'sessions (docs/scaling.md), so an end-of-run '
                         'anchor bounds the drift WITHIN this session')
    args = ap.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    from nexoclom_tpu.initial_state.sections import effective_taa
    from nexoclom_tpu.ops.integrator import (adaptive_pool_loop,
                                             adaptive_step_driver_baked,
                                             packet_state_from_dict)
    from nexoclom_tpu.particle_tracking.output import (
        build_force_table, build_surface_table, engine_spec_from_inputs)
    from nexoclom_tpu.solarsystem import planet_dist

    here = os.path.dirname(os.path.abspath(__file__))
    inp = Input(os.path.join(here, '..', 'tests', 'data', 'inputfiles',
                             'mercury_ca_spot.input'))
    inp.options.endtime = args.endtime
    inp.options.step_size = 0.0
    inp.options.resolution = args.resolution

    dtype = jnp.float32
    radius_km = inp.geometry.planet.radius
    taa = effective_taa(inp.geometry)
    r, v_r = planet_dist(inp.geometry.planet, taa)
    spec = engine_spec_from_inputs(inp)
    forces = build_force_table(inp, r, v_r / radius_km, radius_km, dtype)
    surface = build_surface_table(inp, spec, radius_km, dtype)
    res = jnp.asarray(args.resolution, dtype)
    edge = jnp.asarray(inp.options.outeredge, dtype)
    rkm = jnp.asarray(radius_km, dtype)
    key = jax.random.PRNGKey(99)

    n = args.packets
    state0 = packet_state_from_dict(
        build_initial_state(inp, n, seed=7, dtype=dtype))
    t0 = time.perf_counter()
    final, iters, stats = adaptive_step_driver_baked(
        state0, spec, forces, surface, res, edge, rkm, key,
        collect_stats=True, inner_steps=4)
    mono_frac = float(jnp.sum(final.frac))
    print(f'monolithic cold: {time.perf_counter() - t0:.1f} s')
    t0 = time.perf_counter()
    final, iters, stats = adaptive_step_driver_baked(
        state0, spec, forces, surface, res, edge, rkm, key,
        collect_stats=True, inner_steps=4)
    accepted = int(np.asarray(stats['accepted'], np.int64).sum())
    dt = time.perf_counter() - t0
    print(f'monolithic warm: {dt:.2f} s, {int(iters)} iters, '
          f'{accepted / dt:.3e} accepted ps/s')

    n_pool = args.pool
    pool_state = packet_state_from_dict(
        build_initial_state(inp, n_pool, seed=7, dtype=dtype))
    accepted_pool = accepted * (n_pool / n)

    config_toks = args.configs.split(',')
    if args.anchor and len(config_toks) > 1:
        config_toks.append(config_toks[0] + ' (anchor)')
    for label in config_toks:
        tok = label.replace(' (anchor)', '')
        parts = tok.split(':')
        se, rf, ins = int(parts[0]), float(parts[1]), int(parts[2])
        grp = int(parts[3]) if len(parts) > 3 else 1   # sort payloads/op
        run = lambda: adaptive_pool_loop(
            pool_state, spec, forces, surface, res, edge, rkm, key,
            batch=n, swap_every=se, refill_fraction=rf, inner_steps=ins,
            sort_group=grp)
        t0 = time.perf_counter()
        final_l, iters_l = run()
        print(f'[{label}] cold: {time.perf_counter() - t0:.1f} s')
        t0 = time.perf_counter()
        final_l, iters_l = run()
        dt_l = time.perf_counter() - t0
        sel = float(np.asarray(final_l.frac[:n]).sum())
        print(f'[{label}] warm: {dt_l:.2f} s, {iters_l} iters -> '
              f'~{accepted_pool / dt_l:.3e} accepted ps/s '
              f'({dt_l / iters_l * 1e3:.2f} ms/iter); frac[:batch] '
              f'{sel:.4e} vs monolithic {mono_frac:.4e}')


if __name__ == '__main__':
    main()
