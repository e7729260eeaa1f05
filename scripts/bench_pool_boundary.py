"""Decompose the pool-loop's +1.05 ms/iter overhead over the monolithic
adaptive driver (real TPU).

The tuned production pool loop (64:0.0625:4, 16M pool) measures 3.20
ms/iter vs the monolithic 2.15 (docs/scaling.md session C) — but the
standalone 11-leaf sort is only ~5.5 ms per swap (~0.09 ms/iter at 64-
iteration boundaries; scripts/bench_compaction_primitives.py), so the
sort CANNOT be the dominant term.  This script times the real pool-loop
program with the boundary scaffolding selectively disabled
(``_boundary`` modes in ``ops/integrator._build_pool_loop_fn``) to
attribute the overhead:

  monolithic      the baked driver: body-only reference ms/iter
  nop             nested-restart cost (inner while_loop re-entered every
                  swap_every iterations, giant carry alive outside)
  checkonly       + the finished-lane reduction
  condnop         + a lax.cond crossing the full carry (1-element touch)
  cond (1 batch)  + the real swap, pool sized for ~1 swap
  cond 16M        the production program (anchor, run first and last)
  cond 16M baked  per-seed key baking (round-3 verdict lever)
  cond 8M         memory-pressure probe: half the carry

The experiment modes never refill, so their physics is wrong by design;
they stop when the first batch drains (~ the monolithic iteration
count).  Run on a QUIET host; every mode is a separate XLA program
(fresh ~4 min compile, persistent-cached).
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
    ap.add_argument('--skip', default='',
                    help='comma list of stage names to skip')
    ap.add_argument('--reps', type=int, default=1,
                    help='warm timed reps per stage (best-of reported; '
                    'the single dispatch swings up to ~30% run to run)')
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(',')))

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
    for _ in range(2):
        t0 = time.perf_counter()
        final, iters, stats = adaptive_step_driver_baked(
            state0, spec, forces, surface, res, edge, rkm, key,
            collect_stats=True, inner_steps=4)
        accepted = int(np.asarray(stats['accepted'], np.int64).sum())
        dt = time.perf_counter() - t0
    print(f'monolithic      {dt:7.2f} s  {int(iters):6d} iters  '
          f'{dt / int(iters) * 1e3:6.3f} ms/iter  '
          f'{accepted / dt:.3e} accepted ps/s', flush=True)
    mono_iters = int(iters)

    pool16 = packet_state_from_dict(
        build_initial_state(inp, args.pool, seed=7, dtype=dtype))
    accepted16 = accepted * (args.pool / n)

    def stage(name, pool_state, accepted_total, **kw):
        if name in skip:
            return
        runner = lambda: adaptive_pool_loop(
            pool_state, spec, forces, surface, res, edge, rkm, key,
            batch=n, swap_every=64, refill_fraction=0.0625,
            inner_steps=4, **kw)
        t0 = time.perf_counter()
        _, it = runner()
        cold = time.perf_counter() - t0
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, it = runner()
            reps.append(time.perf_counter() - t0)
        dt = min(reps)
        rate = accepted_total / dt if accepted_total else float('nan')
        print(f'{name:15s} {dt:7.2f} s  {int(it):6d} iters  '
              f'{dt / int(it) * 1e3:6.3f} ms/iter  {rate:.3e} accepted '
              f'ps/s  (cold {cold:.0f} s; reps '
              f'{" ".join(f"{r:.1f}" for r in reps)})', flush=True)

    # production anchor first (already cached from round 3)
    stage('cond-16M-a', pool16, accepted16)
    # scaffolding decomposition: first batch only, no refills
    stage('nop', pool16, None, _boundary='nop',
          max_total_iterations=mono_iters + 64)
    stage('checkonly', pool16, None, _boundary='checkonly',
          max_total_iterations=mono_iters + 64)
    stage('condnop', pool16, None, _boundary='condnop',
          max_total_iterations=mono_iters + 64)
    # one-swap pool: real swap cost at minimal swap count
    pool_1swap = jax.tree.map(
        lambda leaf: leaf[:n + (n >> 4)], pool16)
    stage('cond-1swap', pool_1swap, accepted * (1 + 1 / 16))
    # per-seed key baking (round-3 verdict lever)
    stage('cond-baked-key', pool16, accepted16, bake_key=True)
    # unconditional swap: sort every boundary, selects instead of cond
    # (correct physics — a production candidate, not a scaffold probe)
    stage('always-16M', pool16, accepted16, _boundary='always')
    # the combined candidate: no cond AND no key argument
    stage('always-baked', pool16, accepted16, _boundary='always',
          bake_key=True)
    # memory-pressure probe: half pool, half carry
    pool8 = jax.tree.map(lambda leaf: leaf[:args.pool // 2], pool16)
    stage('cond-8M', pool8, accepted16 / 2)
    # anchor repeat (session drift bound)
    stage('cond-16M-b', pool16, accepted16)


if __name__ == '__main__':
    main()
