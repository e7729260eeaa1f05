"""Demo: multi-member parameter-sweep ensemble in one compiled program.

BASELINE.json's scale configuration is a multi-species source-parameter
sweep sharded over a pod.  This demo runs an ensemble of Mercury runs with
different radiation-pressure/ionization parameters (a TAA sweep) through
:func:`nexoclom_tpu.parallel.make_ensemble_step`: one jit, every member
advancing in lockstep, packet axis shardable over the 'packets' mesh axis.

On one chip the ensemble axis is vmapped; on a pod the same program shards
over ('ensemble', 'packets') — see __graft_entry__.dryrun_multichip, which
executes this exact structure on virtual devices.

The sweep axis is (species x TAA): ``--species Na,Ca,Mg --members 4``
runs a 12-member ensemble (4 true anomalies per species) — the
north-star scale configuration (BASELINE.json's multi-species
parameter sweep; the reference fans one Condor job per species input,
``utilities/Condor.py:21-105``).

Usage: python scripts/demo_ensemble_sweep.py [--members 8]
       [--species Na[,Ca,Mg]] [--packets 65536] [--nsteps 121] [--tpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--members', type=int, default=8,
                        help='true anomalies per species')
    parser.add_argument('--species', default='Na',
                        help='comma-separated species list (sweep axis is '
                             'species x TAA)')
    parser.add_argument('--packets', type=int, default=65536,
                        help='packets per member per chunk')
    parser.add_argument('--nsteps', type=int, default=121)
    parser.add_argument('--chunks', type=int, default=1,
                        help='sequential seed chunks through the one '
                             'compiled program (scale runs: total packets '
                             '= members x species x packets x chunks)')
    parser.add_argument('--tpu', action='store_true')
    args = parser.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nexoclom_tpu.ops.integrator import EngineSpec, default_lookup_impl
    from nexoclom_tpu.parallel import make_ensemble_step, species_sweep_tables
    from nexoclom_tpu.solarsystem import SSObject

    dtype = jnp.float32
    mercury = SSObject('Mercury')
    radius_km = mercury.radius

    # sweep members: (species x TAA) — distance, radial velocity, radpres
    # table, and photo rate all vary per member.  species_sweep_tables
    # compresses each species ONCE at 1 AU, scales per TAA, and pads every
    # table to a common knot count so one compiled program covers the
    # whole sweep (parallel/ensemble.py).
    species = [s.strip() for s in args.species.split(',') if s.strip()]
    taas = np.linspace(0, 2 * np.pi, args.members, endpoint=False)
    members = [(sp, float(taa)) for sp in species for taa in taas]
    forces = species_sweep_tables(members, mercury, dtype=dtype)
    n_members = len(members)
    keys = jax.random.split(jax.random.PRNGKey(7), n_members)

    spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True,
                      lookup_impl=default_lookup_impl())
    step = make_ensemble_step(
        spec, step_size=30.0, outeredge=25.0, radius_km=radius_km,
        nsteps=args.nsteps, n_packets=args.packets,
        vprob_model=2.0 / radius_km, delv_model=1.0 / radius_km,
        endtime=30.0 * args.nsteps, image_bins=64, dtype=dtype)
    member_names = [f'{sp}@{np.degrees(taa):.0f}' for sp, taa in members]
    compiled = jax.jit(step)

    final, images = compiled(keys, forces)          # compile + warmup
    checksum = float(jnp.sum(images))

    # timed chunks: independent seed streams through the ONE compiled
    # program, per-member images accumulated on device (the 1e9-packet
    # multi-species sweep pattern — BASELINE.md north-star scale config)
    t0 = time.perf_counter()
    total_images = jnp.zeros_like(images)
    for c in range(args.chunks):
        keys = jax.random.split(jax.random.PRNGKey(1000 + c), n_members)
        final, images = compiled(keys, forces)
        total_images = total_images + images
    checksum = float(jnp.sum(total_images))          # device sync
    elapsed = time.perf_counter() - t0

    total_packets = n_members * args.packets * args.chunks
    packet_steps = total_packets * (args.nsteps - 1)
    print(f'backend = {jax.default_backend()}')
    print(f'{n_members} members ({len(species)} species x {args.members} '
          f'TAA) x {args.packets} packets x {args.chunks} chunks '
          f'= {total_packets:.3e} packets, x {args.nsteps - 1} steps '
          f'= {packet_steps:.3e} packet-steps '
          f'in {elapsed:.2f} s -> {packet_steps / elapsed:.3e} '
          f'packet-steps/s')
    surviving = np.asarray(jax.vmap(lambda f: jnp.sum(f.frac))(final))
    for name, frac in zip(member_names, surviving / args.packets):
        print(f'  {name}: surviving frac {frac:.3f}')
    print(f'image checksum = {checksum:.4e}')


if __name__ == '__main__':
    main()
