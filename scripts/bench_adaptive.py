"""Adaptive-driver throughput + lockstep-divergence analysis (real TPU).

The reference's primary mode is adaptive stepping (Output.py:221-366); this
build runs it as one lax.while_loop with per-packet step sizes, so every
iteration advances ALL lanes and lanes whose packets are finished (or whose
trial step was rejected) do wasted work.  This script measures:

  * accepted packet-steps/s  — useful work rate (what bench.py reports for
    the constant-step driver)
  * attempted packet-steps/s — raw lane rate incl. dead/rejected lanes
  * efficiency breakdown     — acceptance rate (rejected trials) and lane
    occupancy (dead lanes), plus the finish-iteration distribution that
    determines whether host-side re-batching/compaction could pay

Usage: python scripts/bench_adaptive.py [--packets 262144] [--case ca|na]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

CASES = {'ca': 'mercury_ca_spot.input', 'na': 'mercury_na_spot.input'}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=1 << 18)
    ap.add_argument('--case', choices=CASES, default='ca')
    ap.add_argument('--resolution', type=float, default=1e-4)
    ap.add_argument('--endtime', type=float, default=10800.0)
    ap.add_argument('--inner-steps', type=int, default=1,
                    help='adaptive iterations per while-loop cond check')
    ap.add_argument('--compact', action='store_true',
                    help='also time the segmented compacting orchestrator')
    ap.add_argument('--pool', type=int, default=0,
                    help='also time adaptive_pool_run over a POOL-packet '
                         'total through a --packets-wide batch (device-side '
                         'sort compaction + refill)')
    ap.add_argument('--segment', type=int, default=512)
    ap.add_argument('--refill-frac', type=float, default=0.5,
                    help='pool refill quantum as a fraction of the batch')
    ap.add_argument('--pool-loop', action='store_true',
                    help='with --pool: also time adaptive_pool_loop (the '
                         'in-loop lax.cond refill, one dispatch total)')
    ap.add_argument('--swap-every', type=int, default=64)
    args = ap.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    from nexoclom_tpu.ops.integrator import (adaptive_step_driver_baked,
                                             packet_state_from_dict)
    from nexoclom_tpu.particle_tracking.output import (
        build_force_table, build_surface_table, engine_spec_from_inputs)
    from nexoclom_tpu.initial_state.sections import effective_taa
    from nexoclom_tpu.solarsystem import planet_dist

    here = os.path.dirname(os.path.abspath(__file__))
    inp = Input(os.path.join(here, '..', 'tests', 'data', 'inputfiles',
                             CASES[args.case]))
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

    n = args.packets
    x0 = build_initial_state(inp, n, seed=7, dtype=dtype)
    state0 = packet_state_from_dict(x0)
    key = jax.random.PRNGKey(99)
    run = lambda: adaptive_step_driver_baked(
        state0, spec, forces, surface, jnp.asarray(args.resolution, dtype),
        jnp.asarray(inp.options.outeredge, dtype),
        jnp.asarray(radius_km, dtype), key, collect_stats=True,
        inner_steps=args.inner_steps)

    # warm (compile)
    t0 = time.perf_counter()
    final, iters, stats = run()
    float(jnp.sum(final.frac))                  # device barrier
    print(f'compile+first run: {time.perf_counter() - t0:.1f} s')

    t0 = time.perf_counter()
    final, iters, stats = run()
    # sum on host in int64: the per-packet counters are int32 (fine, each
    # <= max_iterations) but their TOTAL passes 2^31 beyond ~1M packets
    accepted = int(np.asarray(stats['accepted'], np.int64).sum())
    dt = time.perf_counter() - t0
    attempted = int(np.asarray(stats['attempted'], np.int64).sum())
    iters = int(iters)
    done_at = np.asarray(stats['done_at'])

    lane_steps = n * iters
    print(f'{args.case}: n={n}, {iters} while-iterations, {dt:.2f} s')
    print(f'  accepted  {accepted / dt:.3e} packet-steps/s '
          f'({accepted} steps)')
    print(f'  attempted {attempted / dt:.3e} packet-steps/s '
          f'(acceptance {accepted / attempted:.1%})')
    print(f'  lane rate {lane_steps / dt:.3e} lane-steps/s '
          f'(occupancy {attempted / lane_steps:.1%})')
    print(f'  lockstep efficiency (accepted/lane) '
          f'{accepted / lane_steps:.1%}')
    q = np.percentile(done_at, [50, 90, 99, 100]).astype(int)
    print(f'  finish iteration p50/p90/p99/max = {q[0]}/{q[1]}/{q[2]}/{q[3]}')
    # compaction model: segment the while loop every S iterations and
    # compact to the live lanes; ideal payoff = 1 - mean_occupancy, real
    # payoff must beat the gather+recompile cost of re-batching
    occ = (done_at[None, :] > np.arange(0, iters,
                                        max(iters // 200, 1))[:, None])
    occ_frac = occ.mean(axis=1)
    print(f'  mean lane occupancy over iterations: {occ_frac.mean():.1%} '
          f'(final 10%: {occ_frac[-len(occ_frac) // 10:].mean():.1%})')

    if args.pool:
        from nexoclom_tpu.ops.integrator import adaptive_pool_run
        n_pool = args.pool
        x0_pool = build_initial_state(inp, n_pool, seed=7, dtype=dtype)
        pool_state = packet_state_from_dict(x0_pool)
        run_p = lambda: adaptive_pool_run(
            pool_state, spec, forces, surface,
            jnp.asarray(args.resolution, dtype),
            jnp.asarray(inp.options.outeredge, dtype),
            jnp.asarray(radius_km, dtype), key,
            batch=n, segment=args.segment,
            inner_steps=args.inner_steps,
            refill_fraction=args.refill_frac)
        t0 = time.perf_counter()
        final_p, iters_p = run_p()
        print(f'pool cold (pool={n_pool}, batch={n}, '
              f'segment={args.segment}): {time.perf_counter() - t0:.1f} s')
        t0 = time.perf_counter()
        final_p, iters_p = run_p()
        dt_p = time.perf_counter() - t0
        # useful work = the same accepted-step total the monolithic runs
        # would do; scale the measured per-packet accepted count
        accepted_pool = accepted * (n_pool / n)
        print(f'pool warm: {dt_p:.2f} s, {iters_p} while-iterations -> '
              f'~{accepted_pool / dt_p:.3e} accepted packet-steps/s '
              f'({accepted_pool / (n_pool * iters_p * (n / n_pool)):.1%} '
              f'est occupancy proxy)')
        # cross-check physics: total surviving frac within MC-identical
        # bounds of the monolithic run on the same first n packets
        sel_frac = float(np.asarray(final_p.frac[:n]).sum())
        mono_frac = float(jnp.sum(final.frac))
        print(f'pool frac[:batch] total {sel_frac:.4e} vs monolithic '
              f'{mono_frac:.4e}')

    if args.pool and args.pool_loop:
        from nexoclom_tpu.ops.integrator import adaptive_pool_loop
        run_l = lambda: adaptive_pool_loop(
            pool_state, spec, forces, surface,
            jnp.asarray(args.resolution, dtype),
            jnp.asarray(inp.options.outeredge, dtype),
            jnp.asarray(radius_km, dtype), key,
            batch=n, swap_every=args.swap_every,
            refill_fraction=args.refill_frac,
            inner_steps=args.inner_steps)
        t0 = time.perf_counter()
        final_l, iters_l = run_l()
        print(f'pool-loop cold (swap_every={args.swap_every}, '
              f'refill={args.refill_frac}): {time.perf_counter() - t0:.1f} s')
        t0 = time.perf_counter()
        final_l, iters_l = run_l()
        dt_l = time.perf_counter() - t0
        accepted_pool = accepted * (args.pool / n)
        print(f'pool-loop warm: {dt_l:.2f} s, {iters_l} while-iterations -> '
              f'~{accepted_pool / dt_l:.3e} accepted packet-steps/s')
        sel = float(np.asarray(final_l.frac[:n]).sum())
        print(f'pool-loop frac[:batch] total {sel:.4e} vs monolithic '
              f'{float(jnp.sum(final.frac)):.4e}')

    if args.compact:
        from nexoclom_tpu.ops.integrator import adaptive_compacting_run
        cargs = dict(segment=args.segment)
        run_c = lambda: adaptive_compacting_run(
            state0, spec, forces, surface,
            jnp.asarray(args.resolution, dtype),
            jnp.asarray(inp.options.outeredge, dtype),
            jnp.asarray(radius_km, dtype), key, **cargs)
        t0 = time.perf_counter()
        final_c, iters_c = run_c()      # first run pays per-shape compiles
        print(f'compacting cold (segment={args.segment}): '
              f'{time.perf_counter() - t0:.1f} s')
        t0 = time.perf_counter()
        final_c, iters_c = run_c()
        dt_c = time.perf_counter() - t0
        print(f'compacting warm: {dt_c:.2f} s -> '
              f'{accepted / dt_c:.3e} packet-steps/s useful-work rate '
              f'({dt / dt_c:.2f}x vs monolithic)')
        assert abs(float(np.sum(final_c.frac)) -
                   float(jnp.sum(final.frac))) / max(
                       float(jnp.sum(final.frac)), 1e-30) < 0.05


if __name__ == '__main__':
    main()
