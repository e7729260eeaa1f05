"""Multi-host (multi-process) initialization: meshes that span processes.

The reference scales across machines with HTCondor job fan-out joined
through PostgreSQL (``utilities/Condor.py:21-105``) — every job a separate
simulation.  The TPU-native equivalent has two layers:

* **independent sweeps** stay host-level: ``utilities/sweep.run_sweep`` /
  ``worker.py`` fan out whole Inputs across processes or machines, joined
  through the file-locked catalog (shared filesystem).
* **one simulation across a pod** (this module): ``initialize_distributed``
  wires the processes into one JAX runtime, after which ``jax.devices()``
  is the GLOBAL device list, ``parallel.mesh.make_mesh`` builds a mesh that
  spans hosts, and the engine's data-parallel packet axis shards over it —
  ICI collectives within a host/slice, DCN across, all inserted by XLA from
  the same shardings the single-host path uses.

Self-test (2 processes x 2 virtual CPU devices, gloo collectives):

    python -m nexoclom_tpu.parallel.distributed --selftest

spawns two processes that run, on a 4-device global mesh, (a) the
constant-step engine with a fused histogram, (b) the ADAPTIVE driver —
whose while_loop termination test is a per-iteration cross-process
collective — (c) the multi-process PRODUCTION POOL LOOP (one independent
local pool run per process over its owned shards, zero cross-process
device collectives, joined by one host-side allgather — bit-exact vs the
monolithic driver), and (d) the LOS cone reduction, each checked for
equality against a single-process run (tests/test_distributed.py runs
this in CI).
"""
from __future__ import annotations

import os
import sys


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids=None):
    """Initialize the cross-process JAX runtime (idempotent).

    On cloud TPU pods the three arguments are auto-detected from the TPU
    metadata and may be omitted; on other clusters pass the coordinator's
    ``host:port``, the process count, and this process's rank (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Call BEFORE any other JAX API touches the backend, then build meshes
    with ``make_mesh()`` as usual — ``jax.devices()`` is global afterwards.
    """
    import jax
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, 'client', None) is not None:
        return                      # already initialized
    # NOTE: do not call jax.process_count()/jax.devices() here — they would
    # initialise the backend, which must happen after distributed init
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)


def shard_host_local_state(state, mesh, with_ensemble: bool = False):
    """Assemble a global sharded PacketState from per-process local arrays.

    Each process passes ITS OWN packets (shape (n_local,) leaves); the
    result is the (n_local * num_processes,) global array sharded over the
    mesh's 'packets' axis — the multi-host analog of
    ``parallel.mesh.shard_state``.
    """
    import jax
    from nexoclom_tpu.parallel.mesh import packet_sharding
    sharding = packet_sharding(mesh, with_ensemble)
    return jax.tree.map(
        lambda leaf: jax.make_array_from_process_local_data(sharding, leaf),
        state)


# ---------------------------------------------------------------------------
# Self-test
# ---------------------------------------------------------------------------

def _selftest_worker(process_id: int, num_processes: int, port: int,
                     devices_per_process: int = 2):
    import numpy as np

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    os.environ['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={devices_per_process}')
    initialize_distributed(f'localhost:{port}',
                           num_processes=num_processes,
                           process_id=process_id)

    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import histogram2d
    from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                             constant_step_driver,
                                             empty_force_table)
    from nexoclom_tpu.parallel.mesh import make_mesh

    n_global_devices = num_processes * devices_per_process
    assert len(jax.devices()) == n_global_devices, \
        f'expected {n_global_devices} global devices, got {len(jax.devices())}'
    mesh = make_mesh(n_packet_shards=n_global_devices)

    # every process generates the full deterministic batch, keeps its slice
    n_global = 512
    n_local = n_global // num_processes
    rng = np.random.default_rng(42)
    full = {
        't': np.full(n_global, 1e9),
        'x': rng.uniform(1.5, 3.0, n_global),
        'y': rng.uniform(-1.0, 1.0, n_global),
        'z': rng.uniform(-1.0, 1.0, n_global),
        'vx': rng.uniform(-4e-4, 4e-4, n_global),
        'vy': rng.uniform(-4e-4, 4e-4, n_global),
        'vz': rng.uniform(-4e-4, 4e-4, n_global),
        'frac': np.ones(n_global),
        'lossfrac': np.zeros(n_global),
    }
    sl = slice(process_id * n_local, (process_id + 1) * n_local)
    local = PacketState(**{k: v[sl] for k, v in full.items()})
    global_state = shard_host_local_state(local, mesh)
    assert global_state.x.shape == (n_global,)

    spec = EngineSpec(gravity=True, radpres=False, constant_rate=True,
                      surface_bounce=False, check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(-1e-7), ion_rate=jnp.asarray(1e-5))

    def acc(state, a):
        return a + histogram2d(state.x, state.z, state.frac,
                               -4.0, 4.0, 8, -4.0, 4.0, 8)

    args = (spec, forces, None, jnp.asarray(30.0), jnp.asarray(1e30),
            jnp.asarray(2440.0), jax.random.PRNGKey(0))
    _, _, hist = constant_step_driver(
        global_state, *args, nsteps=9, save_history=False,
        accumulator=acc, acc_init=jnp.zeros((8, 8)))

    # single-device reference on the full batch
    with jax.transfer_guard('allow'):
        ref_state = PacketState(**{k: jnp.asarray(v)
                                   for k, v in full.items()})
    _, _, ref = constant_step_driver(
        ref_state, *args, nsteps=9, save_history=False,
        accumulator=acc, acc_init=jnp.zeros((8, 8)))

    # the histogram reduces replicated, so every process reads it locally
    got = np.asarray(jax.device_get(
        jax.tree.map(lambda x: x.addressable_data(0), hist)))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-12, atol=1e-12)

    # --- adaptive driver across processes: the while_loop cond is a global
    # all-lanes-done reduction, i.e. a per-iteration CROSS-PROCESS
    # collective (gloo here, DCN on a pod) — the reference's default mode
    from nexoclom_tpu.ops.integrator import adaptive_step_driver
    full_a = dict(full, t=np.full(n_global, 600.0))
    local_a = PacketState(**{k: v[sl] for k, v in full_a.items()})
    global_a = shard_host_local_state(local_a, mesh)
    a_args = (spec, forces, None, jnp.asarray(1e-4), jnp.asarray(1e30),
              jnp.asarray(2440.0), jax.random.PRNGKey(1))
    fin_g, it_g = adaptive_step_driver(global_a, *a_args,
                                       max_iterations=2000)
    with jax.transfer_guard('allow'):
        ref_a = PacketState(**{k: jnp.asarray(v)
                               for k, v in full_a.items()})
    fin_r, it_r = adaptive_step_driver(ref_a, *a_args, max_iterations=2000)
    assert int(jax.device_get(it_g)) == int(it_r) < 2000
    # sharded leaves are only partly addressable per process: compare each
    # local shard against its slice of the single-device reference
    for name, leaf_g, leaf_r in zip(fin_g._fields, fin_g, fin_r):
        for s in leaf_g.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), np.asarray(leaf_r)[s.index],
                rtol=1e-12, atol=1e-15, err_msg=name)

    # --- multi-process production pool loop: one independent local pool
    # run per process over its owned packet-axis shards (zero
    # cross-process device collectives), joined by one host-side
    # allgather — must be bit-exact vs the single-device monolithic
    # BAKED driver for deterministic physics (bit-exactness only holds
    # within the baked family: baking tables/scalars as XLA constants
    # permutes fusion at ULP level vs the argument form)
    from nexoclom_tpu.ops.integrator import (adaptive_pool_loop_sharded,
                                             adaptive_step_driver_baked)
    state_pool = shard_host_local_state(local_a, mesh)
    fin_p, it_p = adaptive_pool_loop_sharded(
        state_pool, *a_args, mesh, batch=32, swap_every=16,
        refill_fraction=0.25)
    assert isinstance(fin_p.x, np.ndarray)
    assert 0 < it_p < 2000
    fin_b, _ = adaptive_step_driver_baked(ref_a, *a_args,
                                          max_iterations=2000)
    for name, leaf_p, leaf_b in zip(fin_p._fields, fin_p, fin_b):
        np.testing.assert_array_equal(np.asarray(leaf_p),
                                      np.asarray(leaf_b),
                                      err_msg=f'pool {name}')

    # --- LOS cone reduction across processes: per-spectrum weight sums
    # cross shards (psum over gloo)
    from nexoclom_tpu.ops.los import los_geometry, los_reduce
    sc = rng.uniform(-6.0, 6.0, (8, 3))
    bore = -sc + rng.normal(0.0, 0.3, (8, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    # identical geometry on every process: rng is seeded and consumed in
    # the same order everywhere
    obstruction, outer_dd = los_geometry(sc, bore, outeredge=30.0)
    los_args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
                jnp.asarray(outer_dd), jnp.asarray(0.2), jnp.asarray(2.44e8))
    rad_g, npk_g, _ = los_reduce(fin_g.x, fin_g.y, fin_g.z,
                                 jnp.maximum(fin_g.frac, 0.01), *los_args)
    rad_r, npk_r, _ = los_reduce(fin_r.x, fin_r.y, fin_r.z,
                                 jnp.maximum(fin_r.frac, 0.01), *los_args)
    assert int(np.asarray(npk_r).sum()) > 0
    np.testing.assert_allclose(
        np.asarray(jax.device_get(rad_g.addressable_data(0))),
        np.asarray(rad_r), rtol=1e-12)

    print(f'SELFTEST-OK process {process_id}: '
          f'{n_global_devices}-device global mesh over '
          f'{num_processes} processes, histogram total '
          f'{float(np.asarray(ref).sum()):.6f}, adaptive {int(it_r)} iters, '
          f'pool-loop {int(it_p)} iters bit-exact, '
          f'LOS {int(np.asarray(npk_r).sum())} views', flush=True)


def run_selftest(num_processes: int = 2, port: int | None = None,
                 timeout: float = 300.0):
    """Spawn the worker processes and wait for both OK lines."""
    import subprocess
    if port is None:
        import socket
        with socket.socket() as s:      # free-port probe
            s.bind(('localhost', 0))
            port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, '-m', 'nexoclom_tpu.parallel.distributed',
         '--worker', str(pid), str(num_processes), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(num_processes)]
    outs = []
    ok = True
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        ok = ok and p.returncode == 0 and 'SELFTEST-OK' in out
    return ok, outs


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv[:1] == ['--worker']:
        _selftest_worker(int(argv[1]), int(argv[2]), int(argv[3]))
    elif argv[:1] == ['--selftest']:
        ok, outs = run_selftest()
        for o in outs:
            print(o)
        sys.exit(0 if ok else 1)
    else:
        print(__doc__)


if __name__ == '__main__':
    main()
