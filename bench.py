"""Benchmark: packet-steps/sec/chip for the full-physics RK5(4) step loop.

Measures the headline engine throughput on the Ca-class Mercury problem
(gravity + radiation-pressure table + shadow-masked photoionization + surface
kill + outer-edge check, constant 30 s steps) over a 2^20-packet batch —
the BASELINE.json north-star metric (target 1e8 packet-steps/sec/chip).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import math
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from nexoclom_tpu.atomicdata import radpres_table
    from nexoclom_tpu.initial_state.loss_info import LossInfo
    from nexoclom_tpu.ops.integrator import (EngineSpec, constant_step_driver,
                                             empty_force_table)
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source
    from nexoclom_tpu.solarsystem import SSObject, planet_dist

    dtype = jnp.float32
    mercury = SSObject('Mercury')
    radius_km = mercury.radius
    aplanet, vr = planet_dist(mercury, 0.0)

    from nexoclom_tpu.ops.integrator import default_lookup_impl
    spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True,
                      lookup_impl=default_lookup_impl())
    from nexoclom_tpu.ops.pltable import compress_uniform
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

    n_packets = 1 << 20
    step_size = 30.0
    endtime = 10800.0
    nsteps = int(math.ceil(endtime / step_size + 1))   # 361

    key = jax.random.PRNGKey(0)
    state0 = sample_uniform_flat_source(
        key, n_packets, vprob=2.5 / radius_km, delv=1.5 / radius_km,
        endtime=endtime, dtype=dtype)
    state0 = jax.block_until_ready(state0)

    def run(state):
        final, _ = constant_step_driver(
            state, spec, forces, None,
            jnp.asarray(step_size, dtype), jnp.asarray(15.0, dtype),
            jnp.asarray(radius_km, dtype), key,
            nsteps=nsteps, save_history=False)
        return final

    # warmup / compile
    warm = run(state0)
    float(jnp.sum(warm.frac))   # device->host transfer: a real barrier

    # block_until_ready is unreliable on the experimental axon platform, so
    # every timed repetition ends with a scalar device->host transfer
    reps = 3
    t0 = time.perf_counter()
    checksum = 0.0
    for _ in range(reps):
        final = run(state0)
        checksum += float(jnp.sum(final.frac))
    elapsed = time.perf_counter() - t0
    assert np.isfinite(checksum)

    packet_steps = reps * n_packets * (nsteps - 1)
    rate = packet_steps / elapsed
    print(json.dumps({
        'metric': 'packet-steps/sec/chip (Ca-class full physics, RK5 const-step)',
        'value': rate,
        'unit': 'packet-steps/s',
        'vs_baseline': rate / 1e8,
    }))


if __name__ == '__main__':
    main()
