"""Fused-observable mode: the in-scan image accumulation must match the
stored-history ModelImage pipeline exactly (same snapshots, same weighting),
and chunking must not change the result."""
import os

import numpy as np
import pytest

from nexoclom_tpu.data_simulation import ModelImage
from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.particle_tracking import Output
from nexoclom_tpu.particle_tracking.fused import fused_image_run

pytestmark = pytest.mark.particle_tracking

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _inputs():
    inp = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    inp.options.endtime = 1200.0
    return inp


PARAMS = {'quantity': 'column', 'dims': '40,40', 'width': '8,8'}


def test_fused_matches_stored_history_column():
    inp = _inputs()
    # stored path: uncompressed Output -> ModelImage
    Output(inp, 400, seed=77, compress=False)
    stored = ModelImage(inp, dict(PARAMS))
    # fused path with the same seed and chunking disabled
    fused = fused_image_run(inp, 400, dict(PARAMS), seed=77)
    assert fused.totalsource == stored.totalsource
    # the stored path round-trips packet states through float32 npz storage;
    # agreement is ~1e-8 relative
    assert np.allclose(fused.image, stored.image, rtol=1e-6,
                       atol=stored.image.max() * 1e-8)
    assert np.allclose(fused.xaxis, stored.xaxis)


def test_fused_matches_stored_history_radiance():
    inp = _inputs()
    Output(inp, 300, seed=31, compress=False)
    params = {'quantity': 'radiance', 'dims': '32,32', 'width': '6,6',
              'subobslongitude': 0.7, 'subobslatitude': 0.3}
    stored = ModelImage(inp, dict(params))
    fused = fused_image_run(inp, 300, dict(params), seed=31)
    # radiance weighting includes the g-value interpolation; the stored path
    # interpolates the raw non-uniform table while the fused path uses the
    # uniform engine regrid -> tiny interpolation differences
    assert np.allclose(fused.image, stored.image, rtol=5e-3,
                       atol=stored.image.max() * 1e-6)


def test_fused_chunking_invariance():
    inp = _inputs()
    whole = fused_image_run(inp, 300, dict(PARAMS), seed=5, chunk=300)
    parts = fused_image_run(inp, 300, dict(PARAMS), seed=5, chunk=100)
    # different chunking draws different RNG streams per chunk, so compare
    # statistically: totals agree to MC noise, normalisation exact
    assert parts.totalsource == whole.totalsource
    total_w = whole.image.sum()
    total_p = parts.image.sum()
    assert abs(total_p - total_w) / total_w < 0.2


def test_fused_requires_constant_step():
    inp = _inputs()
    inp.options.step_size = 0.0
    inp.options.resolution = 1e-4
    with pytest.raises(ValueError):
        fused_image_run(inp, 10, dict(PARAMS))


def test_snapshot_stride_normalisation():
    """Strided accumulation is an unbiased subsample: the normalised image
    totals agree within MC noise, and the snapshot bookkeeping is exact."""
    inp = _inputs()
    full = fused_image_run(inp, 400, dict(PARAMS), seed=21)
    strided = fused_image_run(inp, 400, dict(PARAMS), seed=21,
                              snapshot_stride=4, stagger=False)
    nsteps = int(np.ceil(1200.0 / 30.0 + 1))
    assert full.totalsource == 400 * nsteps
    assert strided.totalsource == 400 * len(range(0, nsteps, 4))
    # same trajectories, quarter the snapshots: totals agree statistically
    ratio = strided.image.sum() / full.image.sum()
    assert abs(ratio - 1.0) < 0.05


def test_staggered_stride_normalisation():
    """Stratified (staggered) striding: packets with index = t (mod k)
    accumulate at step t; bookkeeping is nsteps/k samples per packet."""
    inp = _inputs()
    full = fused_image_run(inp, 400, dict(PARAMS), seed=21)
    stag = fused_image_run(inp, 400, dict(PARAMS), seed=21,
                           snapshot_stride=4, stagger=True)
    nsteps = int(np.ceil(1200.0 / 30.0 + 1))
    assert stag.totalsource == pytest.approx(400 * nsteps / 4)
    ratio = stag.image.sum() / full.image.sum()
    assert abs(ratio - 1.0) < 0.05


def test_staggered_accumulation_exact_vs_history():
    """The staggered accumulator folds exactly the (packet, step) samples
    whose stratum (contiguous block index, (p // m) % k with
    m = N/(k*shards)) equals step mod k, verified against the stored
    trajectory history."""
    import jax
    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import histogram2d
    from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                             constant_step_driver,
                                             empty_force_table)

    n, k, nsteps = 64, 4, 9
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 7)
    state0 = PacketState(
        t=jnp.full((n,), 1e9),
        x=jax.random.uniform(ks[0], (n,), jnp.float64, 1.5, 3.0),
        y=jax.random.uniform(ks[1], (n,), jnp.float64, -1.0, 1.0),
        z=jax.random.uniform(ks[2], (n,), jnp.float64, -1.0, 1.0),
        vx=jax.random.uniform(ks[3], (n,), jnp.float64, -4e-4, 4e-4),
        vy=jax.random.uniform(ks[4], (n,), jnp.float64, -4e-4, 4e-4),
        vz=jax.random.uniform(ks[5], (n,), jnp.float64, -4e-4, 4e-4),
        frac=jnp.ones((n,), jnp.float64),
        lossfrac=jnp.zeros((n,), jnp.float64))
    spec = EngineSpec(gravity=True, radpres=False, constant_rate=True,
                      surface_bounce=False, check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(-1e-7), ion_rate=jnp.asarray(1e-5))

    def acc_fn(state, acc):
        return acc + histogram2d(state.x, state.z, state.frac,
                                 -4.0, 4.0, 8, -4.0, 4.0, 8)

    args = (spec, forces, None, jnp.asarray(30.0), jnp.asarray(1e30),
            jnp.asarray(2440.0), key)
    def hist_np(x, z, w):
        h, _, _ = np.histogram2d(x, z, bins=(8, 8),
                                 range=[[-4, 4], [-4, 4]], weights=w)
        return h

    for shards in (1, 2):
        final, history, acc = constant_step_driver(
            state0, *args, nsteps=nsteps, save_history=True,
            accumulator=acc_fn, acc_init=jnp.zeros((8, 8), jnp.float64),
            acc_stride=k, acc_stagger=True, acc_shards=shards)

        # expected: step 0 from state0, steps 1..nsteps-1 from history
        # rows, each restricted to the step's stratum
        expect = np.zeros((8, 8))
        stratum = (np.arange(n) // (n // (k * shards))) % k
        snaps = [state0] + [jax.tree.map(lambda l: l[t], history)
                            for t in range(nsteps - 1)]
        for t, snap in enumerate(snaps):
            sel = stratum == t % k
            expect += hist_np(np.asarray(snap.x)[sel],
                              np.asarray(snap.z)[sel],
                              np.asarray(snap.frac)[sel])
        np.testing.assert_allclose(np.asarray(acc), expect, rtol=1e-12,
                                   atol=1e-12)


def test_fast_mode_matches_parity_statistically():
    """fast=True (per-step radpres) stays within MC-negligible distance of
    the parity per-stage evaluation."""
    inp = _inputs()
    a = fused_image_run(inp, 400, dict(PARAMS), seed=21)
    b = fused_image_run(inp, 400, dict(PARAMS), seed=21, fast=True)
    ratio = b.image.sum() / a.image.sum()
    assert abs(ratio - 1.0) < 0.01


def test_fused_matches_stored_history_torus_satellite():
    """Fused exactness holds for the full field stack too: Io satellite
    source with a tilted, System III-modulated torus (F23/F25/F28) —
    the in-scan accumulation must equal the stored-history ModelImage."""
    import pickle
    phi = np.linspace(0, 2 * np.pi, 25)
    profile = {'rho': np.array([0.0, 4.0, 5.9, 8.0, 12.0]),
               'rate': np.array([0.0, 1e-4, 5e-4, 1e-4, 0.0]),
               'z': np.array([-2.0, 0.0, 2.0]),
               'rate_z': np.array([0.0, 1.0, 0.0]),
               'phi': phi, 'rate_phi': 1 + 0.5 * np.cos(phi)}
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, 'torus.pkl')
        with open(path, 'wb') as f:
            pickle.dump(profile, f)
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 1200.0
        inp.options.step_size = 30.0
        inp.options.lifetime = -1e30
        inp.options.eimp_profile = path
        inp.options.eimp_tilt = 6.4
        inp.options.eimp_phi_phase = 90.0
        params = {'quantity': 'column', 'dims': '32,32', 'width': '16,16'}
        Output(inp, 200, seed=13, compress=False)
        stored = ModelImage(inp, dict(params))
        fused = fused_image_run(inp, 200, dict(params), seed=13)
        assert fused.totalsource == stored.totalsource
        assert np.allclose(fused.image, stored.image, rtol=1e-6,
                           atol=stored.image.max() * 1e-8)
