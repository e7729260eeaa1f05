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
