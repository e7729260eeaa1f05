"""Sub-pool routing experiment (real TPU): does splitting one huge pool
into sequential smaller pool-loop invocations beat a single invocation?

Motivation (docs/scaling.md, round-4 boundary decomposition): the pool
loop's per-iteration cost falls with carry size — cond-8M measured 3.15
ms/iter vs cond-16M's 3.8-4.2 in the same session, and removing the
lax.cond ('always') or the key argument (baked) moved nothing.  The
carry is ~1.8 GB at a 16M pool (pool + output buffer + batch); halving
it recovers real per-iter time, at the price of one extra drain tail
(each invocation's last batch runs to completion at decaying occupancy)
and one extra host round trip (~50 ms).

This times the SAME 16M-packet workload routed as 1x16M, 2x8M, 4x4M
sequential `adaptive_pool_loop` invocations (identical physics; each
sub-pool is a contiguous slice, per-invocation RNG folded like the
sharded orchestrator folds per-shard streams).

Run on a QUIET host.  16M and 8M programs are persistent-cached from
the boundary bench; 4M costs one fresh compile (~20 min).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--total', type=int, default=1 << 24)
    ap.add_argument('--reps', type=int, default=3)
    ap.add_argument('--splits', default='1,2,4',
                    help='comma list of sub-pool counts to time')
    ap.add_argument('--resolution', type=float, default=1e-4)
    ap.add_argument('--endtime', type=float, default=10800.0)
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

    n_batch = 1 << 20
    # accepted-step total from a monolithic run of one batch, scaled
    state_b = packet_state_from_dict(
        build_initial_state(inp, n_batch, seed=7, dtype=dtype))
    _, _, stats = adaptive_step_driver_baked(
        state_b, spec, forces, surface, res, edge, rkm, key,
        collect_stats=True, inner_steps=4)
    accepted = (int(np.asarray(stats['accepted'], np.int64).sum())
                * (args.total / n_batch))

    pool = packet_state_from_dict(
        build_initial_state(inp, args.total, seed=7, dtype=dtype))

    for n_split in (int(s) for s in args.splits.split(',')):
        size = args.total // n_split
        subs = [jax.tree.map(lambda leaf: leaf[i * size:(i + 1) * size],
                             pool) for i in range(n_split)]

        def run_all():
            iters = 0
            for i, sub in enumerate(subs):
                _, it = adaptive_pool_loop(
                    sub, spec, forces, surface, res, edge, rkm,
                    jax.random.fold_in(key, i) if n_split > 1 else key,
                    batch=n_batch, swap_every=64,
                    refill_fraction=0.0625, inner_steps=4)
                iters += it
            return iters

        t0 = time.perf_counter()
        iters = run_all()
        cold = time.perf_counter() - t0
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            iters = run_all()
            reps.append(time.perf_counter() - t0)
        dt = min(reps)
        print(f'{n_split}x{size >> 20}M  {dt:7.2f} s  {iters:6d} iters  '
              f'{dt / iters * 1e3:6.3f} ms/iter  '
              f'{accepted / dt:.3e} accepted ps/s  (cold {cold:.0f} s; '
              f'reps {" ".join(f"{r:.1f}" for r in reps)})', flush=True)


if __name__ == '__main__':
    main()
