"""Sharding tests on the 8-virtual-device CPU mesh: the sharded ensemble
step must produce identical physics to unsharded execution, and the graft
entry points must compile and run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nexoclom_tpu.ops.integrator import EngineSpec, empty_force_table
from nexoclom_tpu.parallel import (make_ensemble_step, make_mesh,
                                   stack_force_tables)

pytestmark = pytest.mark.parallel

RADIUS_KM = 2440.53
GM = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3


def _setup(ensemble, n_packets, nsteps=8):
    spec = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM), ion_rate=jnp.asarray(1e-5))
    step = make_ensemble_step(
        spec, step_size=30.0, outeredge=1e30, radius_km=RADIUS_KM,
        nsteps=nsteps, n_packets=n_packets,
        vprob_model=4.0 / RADIUS_KM, delv_model=3.0 / RADIUS_KM,
        endtime=30.0 * nsteps, image_bins=16, dtype=jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(1), ensemble)
    forces_stacked = stack_force_tables([forces] * ensemble)
    return step, keys, forces_stacked


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_sharded_matches_unsharded():
    step, keys, forces = _setup(ensemble=4, n_packets=256)
    final_ref, images_ref = jax.jit(step)(keys, forces)

    mesh = make_mesh(n_ensemble=2, n_packet_shards=4)
    with mesh:
        keys_s = jax.device_put(keys, NamedSharding(mesh, P('ensemble')))
        forces_s = jax.tree.map(
            lambda leaf: jax.device_put(leaf,
                                        NamedSharding(mesh, P('ensemble'))),
            forces)
        final_s, images_s = jax.jit(step)(keys_s, forces_s)
        jax.block_until_ready(images_s)

    assert np.allclose(np.asarray(images_s), np.asarray(images_ref),
                       rtol=1e-12, atol=1e-12)
    for leaf_s, leaf_r in zip(jax.tree.leaves(final_s),
                              jax.tree.leaves(final_ref)):
        assert np.allclose(np.asarray(leaf_s), np.asarray(leaf_r),
                           rtol=1e-12, atol=1e-12)


def test_packet_axis_actually_sharded():
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    from nexoclom_tpu.parallel import packet_sharding, shard_state
    x = jnp.arange(1024, dtype=jnp.float64)
    xs = jax.device_put(x, packet_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.x.shape == args[0].x.shape
    assert bool(jnp.isfinite(out.frac).all())


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, '/root/repo')
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
    dryrun_multichip(4)
    dryrun_multichip(1)


def test_adaptive_sharded_matches_unsharded():
    """The adaptive while_loop under a packet-sharded mesh: the cond's
    global all-lanes-done reduction becomes a per-iteration collective —
    results must match the single-device run exactly (the reference's
    DEFAULT mode, input_classes.py:1085-1092, must scale too)."""
    from nexoclom_tpu.ops.integrator import (adaptive_step_driver,
                                             adaptive_step_driver_baked)
    from nexoclom_tpu.parallel import packet_sharding
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source

    spec = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM), ion_rate=jnp.asarray(1e-4))
    key = jax.random.PRNGKey(3)
    state0 = sample_uniform_flat_source(
        key, 256, vprob=3.0 / RADIUS_KM, delv=2.0 / RADIUS_KM,
        endtime=3600.0, dtype=jnp.float64)
    args = (spec, forces, None, 1e-4, 30.0, RADIUS_KM, key)

    final_ref, iters_ref = adaptive_step_driver(state0, *args,
                                                max_iterations=5000)

    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    with mesh:
        state_s = jax.tree.map(
            lambda leaf: jax.device_put(leaf, packet_sharding(mesh)), state0)
        final_s, iters_s = adaptive_step_driver(state_s, *args,
                                                max_iterations=5000)
        jax.block_until_ready(final_s)
        # the baked variant (the production TPU path) under the same mesh
        final_b, iters_b = adaptive_step_driver_baked(state_s, *args,
                                                      max_iterations=5000)
        jax.block_until_ready(final_b)

    assert int(iters_s) == int(iters_ref) == int(iters_b)
    assert int(iters_ref) < 5000          # actually converged
    for name, leaf_s, leaf_b, leaf_r in zip(
            final_ref._fields, final_s, final_b, final_ref):
        np.testing.assert_allclose(np.asarray(leaf_s), np.asarray(leaf_r),
                                   rtol=1e-12, atol=1e-15, err_msg=name)
        np.testing.assert_allclose(np.asarray(leaf_b), np.asarray(leaf_r),
                                   rtol=1e-12, atol=1e-15, err_msg=name)
    # all packets finished (converged or dead), so the physics is real
    assert bool(jnp.all((final_ref.t <= 1e-4) | (final_ref.frac == 0.0)))


def test_pool_loop_sharded_matches_monolithic():
    """The multi-chip production adaptive path: one independent in-loop
    pool refill per shard (shard_map, zero collectives — per-device
    while-loop trip counts diverge freely).  Deterministic physics must
    be bit-exact vs the single-device monolithic driver."""
    from nexoclom_tpu.ops.integrator import (adaptive_pool_loop_sharded,
                                             adaptive_production_run,
                                             adaptive_step_driver)
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source

    spec = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM), ion_rate=jnp.asarray(1e-4))
    key = jax.random.PRNGKey(3)
    state0 = sample_uniform_flat_source(
        key, 512, vprob=3.0 / RADIUS_KM, delv=2.0 / RADIUS_KM,
        endtime=3600.0, dtype=jnp.float64)
    args = (spec, forces, None, 1e-4, 30.0, RADIUS_KM, key)

    final_m, _ = adaptive_step_driver(state0, *args, max_iterations=5000)

    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    final_s, iters = adaptive_pool_loop_sharded(
        state0, *args, mesh, batch=32, swap_every=16, refill_fraction=0.25)
    assert isinstance(final_s.x, np.ndarray)     # host, original order
    assert iters < 5000
    for f in final_m._fields:
        np.testing.assert_array_equal(np.asarray(getattr(final_s, f)),
                                      np.asarray(getattr(final_m, f)),
                                      err_msg=f)

    # per_shard < batch (512/8 = 64 < 128): the balanced placement must
    # give every shard its own real packets + local padding, with the id
    # arithmetic still reassembling original order exactly
    final_w, _ = adaptive_pool_loop_sharded(
        state0, *args, mesh, batch=128, swap_every=16, refill_fraction=0.25)
    for f in ('t', 'x', 'frac', 'lossfrac'):
        np.testing.assert_array_equal(np.asarray(getattr(final_w, f)),
                                      np.asarray(getattr(final_m, f)),
                                      err_msg=f'wide-batch {f}')

    # an unsatisfiable refill quantum (k_refill > batch) must be rejected
    # up front — on device it would spin forever past every iteration cap
    with pytest.raises(ValueError, match='refill_fraction'):
        adaptive_pool_loop_sharded(state0, *args, mesh, batch=32,
                                   swap_every=16, refill_fraction=1.5)

    # the production router takes the same path when handed a mesh, and
    # scales its auto threshold by the shard count
    final_r, _ = adaptive_production_run(
        state0, *args, orchestrator='pool', mesh=mesh, batch=32,
        swap_every=16, refill_fraction=0.25, inner_steps=1)
    for f in ('t', 'x', 'frac', 'lossfrac'):
        np.testing.assert_array_equal(getattr(final_r, f),
                                      np.asarray(getattr(final_m, f)),
                                      err_msg=f)
    # n=512 >= pool_min(=128) * 1 unsharded but < 128 * 8 sharded: auto
    # must fall back to chunking rather than hand each shard a sub-
    # amortisation pool
    final_a, _ = adaptive_production_run(
        state0, *args, orchestrator='auto', mesh=mesh, batch=32,
        swap_every=16, refill_fraction=0.25, pool_min=128, inner_steps=1)
    assert not isinstance(final_a.x, np.ndarray)  # chunked: device arrays
    np.testing.assert_allclose(np.asarray(final_a.x),
                               np.asarray(final_m.x), rtol=1e-12)


def test_pool_sharded_multiprocess_matches():
    """The multi-process production pool loop (one local run per process
    over its owned shards, host-side allgather join) matches the
    monolithic driver bit-exactly — the real 2-process check lives in
    the distributed selftest (tests/test_distributed.py asserts its
    'pool-loop ... bit-exact' marker); here the decomposition machinery
    is exercised in-process: shard-ownership math, shard_offset key
    folding (shard s draws the same stream no matter which process runs
    it), and the addressable-slice extraction from GSPMD-sharded and
    host-replicated states."""
    from nexoclom_tpu.ops.integrator import (_addressable_slice,
                                             adaptive_pool_loop_sharded,
                                             adaptive_step_driver)
    from nexoclom_tpu.parallel import packet_sharding
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source

    spec = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM), ion_rate=jnp.asarray(1e-4))
    key = jax.random.PRNGKey(3)
    state0 = sample_uniform_flat_source(
        key, 512, vprob=3.0 / RADIUS_KM, delv=2.0 / RADIUS_KM,
        endtime=600.0, dtype=jnp.float64)
    args = (spec, forces, None, 1e-4, 30.0, RADIUS_KM, key)
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)

    final_m, _ = adaptive_step_driver(state0, *args, max_iterations=5000)

    # shard_offset: the whole-mesh run equals two half-mesh runs with the
    # second offset by 4 — exactly the per-process decomposition the
    # multi-process path performs (deterministic physics: bit-exact)
    full, _ = adaptive_pool_loop_sharded(state0, *args, mesh, batch=32,
                                         swap_every=16,
                                         refill_fraction=0.25)
    devs = np.asarray(mesh.devices).reshape(-1)
    lo_mesh = jax.sharding.Mesh(devs[:4], ('packets',))
    hi_mesh = jax.sharding.Mesh(devs[4:], ('packets',))
    lo_state = jax.tree.map(lambda leaf: leaf[:256], state0)
    hi_state = jax.tree.map(lambda leaf: leaf[256:], state0)
    lo_fin, _ = adaptive_pool_loop_sharded(
        lo_state, *args, lo_mesh, batch=32, swap_every=16,
        refill_fraction=0.25, shard_offset=0)
    hi_fin, _ = adaptive_pool_loop_sharded(
        hi_state, *args, hi_mesh, batch=32, swap_every=16,
        refill_fraction=0.25, shard_offset=4)
    for f in final_m._fields:
        joined = np.concatenate([np.asarray(getattr(lo_fin, f)),
                                 np.asarray(getattr(hi_fin, f))])
        np.testing.assert_array_equal(joined,
                                      np.asarray(getattr(full, f)),
                                      err_msg=f'split-join {f}')
        np.testing.assert_array_equal(joined,
                                      np.asarray(getattr(final_m, f)),
                                      err_msg=f'vs monolithic {f}')

    # _addressable_slice: GSPMD-sharded array (local shards cover the
    # range), host numpy, and the zero-fill past the global end
    with mesh:
        sharded_x = jax.device_put(state0.x, packet_sharding(mesh))
    np.testing.assert_array_equal(_addressable_slice(sharded_x, 128, 384),
                                  np.asarray(state0.x)[128:384])
    np.testing.assert_array_equal(
        _addressable_slice(np.asarray(state0.x), 0, 64),
        np.asarray(state0.x)[:64])
    tail = _addressable_slice(np.asarray(state0.x), 448, 576)
    np.testing.assert_array_equal(tail[:64], np.asarray(state0.x)[448:])
    np.testing.assert_array_equal(tail[64:], np.zeros(64))


def test_output_sharded_matches_unsharded():
    """The user-facing multi-chip switch: Output(..., sharded=True)
    shards the packet axis over all local devices with identical physics
    in both driver modes (Input.run forwards the flag per chunk)."""
    import os
    import pandas as pd
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.output import Output

    here = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')

    def frames(out):
        return out.X.sort_values('x').reset_index(drop=True)

    # a caller mesh without a 'packets' axis gets guidance, not a KeyError
    from nexoclom_tpu.utilities.exceptions import InputError
    inp0 = Input(os.path.join(here, 'mercury_uniform_flat.input'))
    bad = jax.sharding.Mesh(np.array(jax.devices()), ('x',))
    with pytest.raises(InputError, match='packets'):
        Output(inp0, 16, seed=9, sharded=bad)

    # adaptive (the reference's default mode; routes through the
    # production router with the mesh); 150 % 8 != 0 exercises the
    # dead-packet padding the NamedSharding divisibility rule needs
    inp = Input(os.path.join(here, 'mercury_uniform_flat.input'))
    inp.options.endtime = 1000.0
    ref = Output(inp, 150, seed=9)
    sh = Output(inp, 150, seed=9, sharded=True)
    pd.testing.assert_frame_equal(frames(ref), frames(sh))

    # constant-step (history mode) under an explicit caller mesh,
    # non-divisible packet count again
    inp2 = Input(os.path.join(here, 'mercury_gravity.input'))
    inp2.options.endtime = 300.0
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    ref2 = Output(inp2, 150, seed=9)
    sh2 = Output(inp2, 150, seed=9, sharded=mesh)
    pd.testing.assert_frame_equal(frames(ref2), frames(sh2))


def test_resolve_packet_mesh():
    """The shared sharded-switch resolver: False -> None, Mesh passes
    through validated, True builds a local-device mesh, and a mesh
    without a 'packets' axis gets guidance."""
    from nexoclom_tpu.parallel import resolve_packet_mesh
    from nexoclom_tpu.utilities.exceptions import InputError
    assert resolve_packet_mesh(False) is None
    assert resolve_packet_mesh(None) is None
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    assert resolve_packet_mesh(mesh) is mesh
    auto = resolve_packet_mesh(True)
    assert int(auto.shape['packets']) == len(jax.devices())
    bad = jax.sharding.Mesh(np.array(jax.devices()), ('x',))
    with pytest.raises(InputError, match='packets'):
        resolve_packet_mesh(bad, 'test')


def test_los_reduce_sharded_matches_unsharded():
    """The O(S x N) LOS cone reduction with the packet axis sharded: the
    per-spectrum weight sums cross shards (psum) — radiance, counts, and
    the per-packet used mask must match the single-device run."""
    from nexoclom_tpu.ops.los import los_geometry, los_reduce
    from nexoclom_tpu.parallel import packet_sharding

    rng = np.random.default_rng(11)
    n = 4096
    r = rng.uniform(1.1, 6.0, n)
    costh = rng.uniform(-1.0, 1.0, n)
    phi = rng.uniform(0.0, 2 * np.pi, n)
    sinth = np.sqrt(1.0 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    weight = jnp.asarray(rng.uniform(0.0, 1.0, n))

    n_spec = 40
    sc = rng.uniform(-8.0, 8.0, (n_spec, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 7.0, 1.0)
    bore = -sc + rng.normal(0.0, 1.0, (n_spec, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, outer_dd = los_geometry(sc, bore, outeredge=10.0)

    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(outer_dd), jnp.asarray(0.05), jnp.asarray(2.44e8))
    rad_ref, npack_ref, used_ref = los_reduce(px, py, pz, weight, *args)
    assert int(npack_ref.sum()) > 0       # the geometry actually sees packets

    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    with mesh:
        sh = packet_sharding(mesh)
        px_s, py_s, pz_s, w_s = (jax.device_put(a, sh)
                                 for a in (px, py, pz, weight))
        rad_s, npack_s, used_s = los_reduce(px_s, py_s, pz_s, w_s, *args)
        jax.block_until_ready(rad_s)

    np.testing.assert_allclose(np.asarray(rad_s), np.asarray(rad_ref),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(npack_s), np.asarray(npack_ref))
    np.testing.assert_array_equal(np.asarray(used_s), np.asarray(used_ref))


def test_los_reduce_pad_rows_inert_for_npackets():
    """Advisor round 3: with the documented default outeredge=1e30 the
    outer_dd cutoff is ~1e30, so a 1e30 position sentinel satisfied
    losrad<=dd for any boresight within dphi of +x and inflated the
    per-spectrum npackets inview count by up to n_shards-1.  The NaN
    sentinel fails every comparison: sharded npackets (and radiance /
    used) must match the unsharded run exactly even with pad rows."""
    from nexoclom_tpu.ops.los import los_geometry, los_reduce
    from nexoclom_tpu.parallel import shard_padded

    rng = np.random.default_rng(7)
    n = 4001                              # NOT divisible by 8: 7 pad rows
    r = rng.uniform(1.1, 6.0, n)
    costh = rng.uniform(-1.0, 1.0, n)
    phi = rng.uniform(0.0, 2 * np.pi, n)
    sinth = np.sqrt(1.0 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    weight = jnp.asarray(rng.uniform(0.0, 1.0, n))

    # the failure geometry: unobstructed boresights pointing near +x
    n_spec = 16
    sc = np.tile(np.array([-7.0, 2.5, 0.0]), (n_spec, 1))
    bore = np.array([1.0, 0.0, 0.0]) + rng.normal(0.0, 0.01, (n_spec, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, outer_dd = los_geometry(sc, bore, outeredge=1e30)
    assert float(outer_dd.min()) > 1e29   # the cutoff a 1e30 pad slips past

    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(outer_dd), jnp.asarray(0.05), jnp.asarray(2.44e8))
    rad_ref, npack_ref, used_ref = los_reduce(px, py, pz, weight, *args)
    assert int(npack_ref.sum()) > 0

    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    (px_s, py_s, pz_s, w_s), pad = shard_padded(
        mesh, (px, py, pz, weight), (np.nan, 0.0, 0.0, 0.0))
    assert pad == 7
    with mesh:
        rad_s, npack_s, used_s = los_reduce(px_s, py_s, pz_s, w_s, *args)
        jax.block_until_ready(rad_s)
    np.testing.assert_allclose(np.asarray(rad_s), np.asarray(rad_ref),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(npack_s), np.asarray(npack_ref))
    np.testing.assert_array_equal(np.asarray(used_s)[:n],
                                  np.asarray(used_ref))


def test_los_reduce_culled_sharded_matches_unsharded():
    """The two-stage block cull under shard_map: per-device Morton sorts
    and tile walks on local shards, one psum pair joining the spectrum
    sums — radiance, counts, and the used mask must match the dense
    single-device run, including pad rows (NaN/0 sentinels)."""
    from nexoclom_tpu.ops.los import (los_geometry, los_reduce,
                                      los_reduce_culled_sharded)
    from nexoclom_tpu.parallel import shard_padded

    rng = np.random.default_rng(17)
    n = 4001                              # NOT divisible by 8: pad path
    r = rng.uniform(1.1, 6.0, n)
    costh = rng.uniform(-1.0, 1.0, n)
    phi = rng.uniform(0.0, 2 * np.pi, n)
    sinth = np.sqrt(1.0 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    weight = jnp.asarray(rng.uniform(0.0, 1.0, n))

    n_spec = 40                           # NOT a chunk multiple either
    sc = rng.uniform(-8.0, 8.0, (n_spec, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 7.0, 1.0)
    bore = -sc + rng.normal(0.0, 1.0, (n_spec, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, outer_dd = los_geometry(sc, bore, outeredge=10.0)

    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(outer_dd), 0.05, 2.44e8)
    rad_ref, npack_ref, used_ref = los_reduce(px, py, pz, weight, *args)
    assert int(npack_ref.sum()) > 0

    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    (px_s, py_s, pz_s, w_s), pad = shard_padded(
        mesh, (px, py, pz, weight), (np.nan, 0.0, 0.0, 0.0))
    rad_s, npack_s, used_s = los_reduce_culled_sharded(
        px_s, py_s, pz_s, w_s, *args, mesh, block=128)
    jax.block_until_ready(rad_s)

    np.testing.assert_allclose(np.asarray(rad_s), np.asarray(rad_ref),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(npack_s), np.asarray(npack_ref))
    np.testing.assert_array_equal(np.asarray(used_s)[:n],
                                  np.asarray(used_ref))


def test_los_fitted_accumulate_sharded_matches_unsharded():
    """The fitted-retrieval scatter-add kernel with the packet axis sharded:
    per-X0 sums cross shards; the padded sentinel rows (weight=0, index 0)
    must contribute nothing."""
    from nexoclom_tpu.ops.los import los_fitted_accumulate, los_geometry
    from nexoclom_tpu.parallel import shard_padded

    rng = np.random.default_rng(13)
    n = 4003                              # NOT divisible by 8: pad path
    n_x0 = 500
    r = rng.uniform(1.1, 6.0, n)
    costh = rng.uniform(-1.0, 1.0, n)
    phi = rng.uniform(0.0, 2 * np.pi, n)
    sinth = np.sqrt(1.0 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    weight = jnp.asarray(rng.uniform(0.0, 1.0, n))
    x0_index = jnp.asarray(rng.integers(0, n_x0, n))

    n_spec = 24
    sc = rng.uniform(-8.0, 8.0, (n_spec, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 7.0, 1.0)
    bore = -sc + rng.normal(0.0, 1.0, (n_spec, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, outer_dd = los_geometry(sc, bore, outeredge=10.0)
    ratio = rng.uniform(0.5, 2.0, n_spec)
    spec_mask = np.ones(n_spec, dtype=bool)
    sigma = rng.uniform(0.05, 0.2, n_spec)

    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(outer_dd), jnp.asarray(ratio),
            jnp.asarray(spec_mask), jnp.asarray(sigma))
    for use_weight in (None, 'dist2', 'sigma'):
        rs_ref, ss_ref = los_fitted_accumulate(
            px, py, pz, weight, x0_index, *args, 0.05, n_x0=n_x0,
            use_weight=use_weight)
        assert float(ss_ref.sum()) > 0

        mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
        (px_s, py_s, pz_s, w_s, idx_s), pad = shard_padded(
            mesh, (px, py, pz, weight, x0_index), (np.nan, 0.0, 0.0, 0.0, 0))
        assert pad == 5
        with mesh:
            rs_s, ss_s = los_fitted_accumulate(
                px_s, py_s, pz_s, w_s, idx_s, *args, 0.05, n_x0=n_x0,
                use_weight=use_weight)
            jax.block_until_ready(rs_s)
        np.testing.assert_allclose(np.asarray(rs_s), np.asarray(rs_ref),
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(ss_s), np.asarray(ss_ref),
                                   rtol=1e-12)


def test_fused_image_sharded_matches_unsharded():
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.parallel import make_mesh
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(inputfiles, 'mercury_ca_spot.input'))
    inp.options.endtime = 600.0
    params = {'quantity': 'column', 'dims': '24,24', 'width': '8,8'}
    plain = fused_image_run(inp, 256, dict(params), seed=9)
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    sharded = fused_image_run(inp, 256, dict(params), seed=9, mesh=mesh)
    assert np.allclose(sharded.image, plain.image, rtol=1e-10, atol=1e-12)


def test_species_taa_ensemble_matches_single():
    """North-star scale config (BASELINE.json): a multi-SPECIES x TAA
    parameter sweep as ONE mesh program.  species_sweep_tables builds
    per-(species, TAA) ForceTables on common leaf shapes (shared radpres
    grid length; relu tables padded with zero-slope knots — identical
    interpolants); every stacked member must reproduce its own
    single-member run bit-for-bit, vmapped AND sharded over a 2-D
    (ensemble, packets) mesh, for both lookup impls.  Reference frame:
    one Condor job per species .input file (utilities/Condor.py:21-105)."""
    from nexoclom_tpu.parallel import species_sweep_tables
    from nexoclom_tpu.solarsystem import SSObject

    mercury = SSObject('Mercury')
    members = [(sp, taa) for sp in ('Na', 'Ca', 'Mg')
               for taa in (0.0, 2.5)]
    forces = species_sweep_tables(members, mercury, dtype=jnp.float64)

    # species really differ: radpres tables and photo rates
    rp = np.asarray(forces.rp_accel)
    ion = np.asarray(forces.ion_rate)
    assert not np.allclose(rp[0], rp[2])       # Na vs Ca accel grids
    assert len({round(float(v), 12) for v in ion}) == len(members) > 4
    # TAA scaling within one species: a(v) scales by (r0/r1)^2 exactly
    assert not np.isclose(ion[0], ion[1])

    keys = jax.random.split(jax.random.PRNGKey(3), len(members))
    for lookup_impl in ('gather', 'relu'):
        spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                          surface_bounce=False, check_outer_edge=True,
                          lookup_impl=lookup_impl)
        step = make_ensemble_step(
            spec, step_size=30.0, outeredge=25.0, radius_km=RADIUS_KM,
            nsteps=8, n_packets=256, vprob_model=2.5 / RADIUS_KM,
            delv_model=1.5 / RADIUS_KM, endtime=240.0, image_bins=16,
            dtype=jnp.float64)
        final_e, images_e = jax.jit(step)(keys, forces)

        # each member's single run (1-member stack, same key)
        for i in (0, 3, 5):
            forces_i = jax.tree.map(lambda leaf: leaf[i:i + 1], forces)
            final_i, images_i = jax.jit(step)(keys[i:i + 1], forces_i)
            np.testing.assert_array_equal(
                np.asarray(images_i[0]), np.asarray(images_e[i]),
                err_msg=f'member {i} ({members[i]}) impl={lookup_impl}')
            np.testing.assert_array_equal(
                np.asarray(final_i.frac[0]), np.asarray(final_e.frac[i]))

        # the same program over a (ensemble=2, packets=4) mesh
        mesh = make_mesh(n_ensemble=2, n_packet_shards=4)
        with mesh:
            sh = NamedSharding(mesh, P('ensemble'))
            keys_s = jax.device_put(keys[:4], sh)
            forces_s = jax.tree.map(
                lambda leaf: jax.device_put(leaf[:4], sh), forces)
            final_s, images_s = jax.jit(step)(keys_s, forces_s)
        np.testing.assert_allclose(np.asarray(images_s),
                                   np.asarray(images_e[:4]),
                                   rtol=1e-12, atol=1e-12)
