"""Demo: multi-member parameter-sweep ensemble in one compiled program.

BASELINE.json's scale configuration is a multi-species source-parameter
sweep sharded over a pod.  This demo runs an ensemble of Mercury runs with
different radiation-pressure/ionization parameters (a TAA sweep) through
:func:`nexoclom_tpu.parallel.make_ensemble_step`: one jit, every member
advancing in lockstep, packet axis shardable over the 'packets' mesh axis.

On one chip the ensemble axis is vmapped; on a pod the same program shards
over ('ensemble', 'packets') — see __graft_entry__.dryrun_multichip, which
executes this exact structure on virtual devices.

Usage: python scripts/demo_ensemble_sweep.py [--members 8]
       [--packets 65536] [--nsteps 121] [--tpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--members', type=int, default=8)
    parser.add_argument('--packets', type=int, default=65536)
    parser.add_argument('--nsteps', type=int, default=121)
    parser.add_argument('--tpu', action='store_true')
    args = parser.parse_args()

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from nexoclom_tpu.atomicdata import radpres_table
    from nexoclom_tpu.initial_state.loss_info import LossInfo
    from nexoclom_tpu.ops.integrator import (EngineSpec, default_lookup_impl,
                                             empty_force_table)
    from nexoclom_tpu.parallel import make_ensemble_step, stack_force_tables
    from nexoclom_tpu.solarsystem import SSObject, planet_dist

    dtype = jnp.float32
    mercury = SSObject('Mercury')
    radius_km = mercury.radius

    # sweep members: Na at different true anomalies (distance + radial
    # velocity + photo rate all vary)
    from nexoclom_tpu.ops.pltable import compress_uniform
    taas = np.linspace(0, 2 * np.pi, args.members, endpoint=False)
    # compress ONCE at 1 AU and scale per member: a(v; aplanet) is exactly
    # a(v; 1 AU)/aplanet^2 on the same grid, and a piecewise-linear fit
    # scales linearly — compressing each member independently could pick
    # different knot counts when a borderline knot sits within an ulp of
    # the tolerance, breaking stack_force_tables' shape contract
    v0, dv, accel_1au = radpres_table('Na', 1.0, npoints=512)
    pl_1au = compress_uniform(v0 / radius_km, dv / radius_km,
                              accel_1au / radius_km, rel_tol=1e-3,
                              dtype=np.float32)
    tables = []
    for taa in taas:
        aplanet, vr = planet_dist(mercury, float(taa))
        scale = 1.0 / aplanet ** 2
        tables.append(empty_force_table(dtype)._replace(
            gm=jnp.asarray(mercury.gm_rp3, dtype),
            vrplanet=jnp.asarray(vr / radius_km, dtype),
            rp_v0=jnp.asarray(v0 / radius_km, dtype),
            rp_dv=jnp.asarray(dv / radius_km, dtype),
            rp_accel=jnp.asarray(accel_1au * scale / radius_km, dtype),
            # base packs [y0, vmax]: scale the value, keep the clamp limit
            rp_pl=pl_1au._replace(
                dslope=pl_1au.dslope * scale,
                base=pl_1au.base * jnp.asarray([scale, 1.0],
                                               pl_1au.base.dtype)),
            ion_rate=jnp.asarray(LossInfo('Na', 0.0, aplanet).photo, dtype)))
    forces = stack_force_tables(tables)
    keys = jax.random.split(jax.random.PRNGKey(7), args.members)

    spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True,
                      lookup_impl=default_lookup_impl())
    step = make_ensemble_step(
        spec, step_size=30.0, outeredge=25.0, radius_km=radius_km,
        nsteps=args.nsteps, n_packets=args.packets,
        vprob_model=2.0 / radius_km, delv_model=1.0 / radius_km,
        endtime=30.0 * args.nsteps, image_bins=64, dtype=dtype)
    compiled = jax.jit(step)

    final, images = compiled(keys, forces)          # compile + run
    checksum = float(jnp.sum(images))
    t0 = time.perf_counter()
    final, images = compiled(keys, forces)
    checksum = float(jnp.sum(images))
    elapsed = time.perf_counter() - t0

    packet_steps = args.members * args.packets * (args.nsteps - 1)
    print(f'backend = {jax.default_backend()}')
    print(f'{args.members} members x {args.packets} packets x '
          f'{args.nsteps - 1} steps = {packet_steps:.3e} packet-steps '
          f'in {elapsed:.2f} s -> {packet_steps / elapsed:.3e} '
          f'packet-steps/s')
    surviving = np.asarray(jax.vmap(lambda f: jnp.sum(f.frac))(final))
    print('surviving frac per member:',
          np.array2string(surviving / args.packets, precision=3))
    print(f'image checksum = {checksum:.4e}')


if __name__ == '__main__':
    main()
