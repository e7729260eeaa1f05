"""End-to-end Output tests: full simulation runs through the public API,
catalog round-trips, and physics invariants on the results (the analogue of
the reference's ``test_gravity.py`` + system run-through)."""
import os

import numpy as np
import pytest

from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.particle_tracking import Output

pytestmark = pytest.mark.integration

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _shrink(inp, endtime=3000.0):
    """Scale the case down for CI speed."""
    inp.options.endtime = endtime
    return inp


def test_gravity_run_energy_conservation():
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out = Output(inp, 300, seed=42, compress=False)

    assert out.npackets == 300
    assert out.nsteps == int(np.ceil(3000.0 / 30.0 + 1))
    assert out.totalsource == 300 * out.nsteps

    X, X0 = out.X, out.X0
    assert len(X) == 300 * out.nsteps
    # per-trajectory energy conservation (reference test_gravity.py:46-55)
    gm = out.GM
    live = X.frac > 0
    r = np.sqrt(X.x ** 2 + X.y ** 2 + X.z ** 2)[live]
    ke = 0.5 * (X.vx ** 2 + X.vy ** 2 + X.vz ** 2)[live]
    energy = ke + gm / r
    e0 = (0.5 * (X0.vx ** 2 + X0.vy ** 2 + X0.vz ** 2) +
          gm / np.sqrt(X0.x ** 2 + X0.y ** 2 + X0.z ** 2))
    e0_per_row = e0.values[X.loc[live, 'Index'].values.astype(int)]
    rel = np.abs((energy.values - e0_per_row) / e0_per_row)
    assert np.max(rel) < 1e-5  # float32 storage bounds the residual

    # X0 sanity: unit sphere launch, speeds within the flat dist bounds
    r0 = np.sqrt(X0.x ** 2 + X0.y ** 2 + X0.z ** 2)
    assert np.allclose(r0, 1.0, atol=1e-6)
    v_kms = X0.v * inp.geometry.planet.radius
    assert v_kms.min() > -1e-6 and v_kms.max() < 8.0 + 1e-3


def test_output_catalog_and_restore(tmp_path):
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out = Output(inp, 50, seed=7)

    ids, files, npackets, totalsource = inp.search()
    assert ids == [out.idnum]
    assert npackets == 50
    assert os.path.exists(out.filename)

    restored = Output.restore(files[0])
    assert restored.npackets == 50
    assert restored.totalsource == out.totalsource
    assert restored.inputs == inp
    assert restored.X0.x.dtype == np.float64
    # float32 storage round-trip
    assert np.allclose(restored.X.x.values, out.X.x.values, atol=1e-5)
    assert restored.aplanet == pytest.approx(out.aplanet)


def test_output_restore_column_pruning(tmp_path):
    """Pruned restores load bit-identical columns (and only those) —
    the fast path compute_iteration / images / density / source maps use."""
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out = Output(inp, 40, seed=11)
    full = Output.restore(out.filename)

    pruned = Output.restore(
        out.filename, columns={'X': ('x', 'y', 'z', 'vy', 'frac', 'Index')})
    assert list(pruned.X.columns) == [
        c for c in full.X.columns
        if c in ('x', 'y', 'z', 'vy', 'frac', 'Index')]
    for col in pruned.X.columns:
        assert pruned.X[col].dtype == full.X[col].dtype
        assert np.array_equal(pruned.X[col].values, full.X[col].values)
    assert len(pruned.X0) == 0          # frame absent from the dict
    assert pruned.npackets == full.npackets == len(full.X0)
    assert pruned.totalsource == full.totalsource
    assert pruned.inputs == full.inputs

    x0_only = Output.restore(out.filename, columns={'X0': None})
    assert list(x0_only.X0.columns) == list(full.X0.columns)
    for col in x0_only.X0.columns:
        assert np.array_equal(x0_only.X0[col].values, full.X0[col].values)
    assert len(x0_only.X) == 0

    with pytest.raises(KeyError):
        Output.restore(out.filename, columns={'X': ('x', 'nosuchcol')})


def test_pull_into_sliced_matches_single_copy(monkeypatch):
    """_pull_into's bounded-slice device pull is bit-identical to one
    np.asarray copy, for 1-D leaves and strided 2-D history views."""
    import jax.numpy as jnp

    from nexoclom_tpu.particle_tracking import output as out_mod

    rng = np.random.default_rng(7)
    # force many slices: 1 KB quantum over ~39 KB sources
    monkeypatch.setattr(out_mod, '_PULL_SLICE_BYTES', 1024)

    src1 = jnp.asarray(rng.standard_normal(10000), jnp.float32)
    dst1 = np.empty(10000, np.float64)
    out_mod._pull_into(dst1, src1)
    assert np.array_equal(dst1, np.asarray(src1, np.float64))

    src2 = jnp.asarray(rng.standard_normal((100, 64)), jnp.float32)
    buf = np.empty((64, 101), np.float64)      # history-style layout
    view = buf[:, 1:]
    out_mod._pull_into(view.T, src2)
    assert np.array_equal(view, np.asarray(src2, np.float64).T)

    # host numpy source: single copy path
    src3 = rng.standard_normal(500).astype(np.float32)
    dst3 = np.empty(500, np.float64)
    out_mod._pull_into(dst3, src3)
    assert np.array_equal(dst3, src3.astype(np.float64))


def test_overlap_pull_frames_identical(monkeypatch):
    """NEXOCLOM_OVERLAP_PULL only reorders the X0 transfer; frames and
    totalsource are bit-identical to the synchronous path."""
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    inp.options.step_size = 0.0
    inp.options.resolution = 1e-3
    base = Output(inp, 64, seed=21)
    monkeypatch.setenv('NEXOCLOM_OVERLAP_PULL', '1')
    over = Output(inp, 64, seed=21)
    assert over.totalsource == base.totalsource
    for col in base.X0.columns:
        assert np.array_equal(over.X0[col].values, base.X0[col].values), col
    for col in base.X.columns:
        assert np.array_equal(over.X[col].values, base.X[col].values), col


def test_save_from_store_bit_identical_to_full_round_trip(tmp_path):
    """The fitted retrieval's raw-copy save writes the same store as a
    full restore + reweight + save (los_fitted.py routes through it)."""
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out = Output(inp, 40, seed=13)

    rng = np.random.default_rng(3)
    x0_scale = rng.uniform(0.2, 2.0, out.npackets)

    # reference path: full restore, rescale frac, plain save
    full = Output.restore(out.filename)
    ids = full.X['Index'].to_numpy().astype(int)
    full.X = full.X.assign(frac=full.X['frac'].to_numpy() * x0_scale[ids])
    full.X0 = full.X0.assign(frac=full.X0['frac'].to_numpy() * x0_scale)
    full.totalsource = float(full.X0['frac'].sum())
    full.compress = False
    full.save()

    # fast path: pruned restore, same rescale, raw-copy save
    pruned = Output.restore(
        out.filename,
        columns={'X': ('x', 'y', 'z', 'vy', 'frac', 'Index'),
                 'X0': ('frac',)})
    ids = pruned.X['Index'].to_numpy().astype(int)
    pruned.X = pruned.X.assign(
        frac=pruned.X['frac'].to_numpy() * x0_scale[ids])
    pruned.X0 = pruned.X0.assign(
        frac=pruned.X0['frac'].to_numpy() * x0_scale)
    pruned.totalsource = float(pruned.X0['frac'].sum())
    pruned.compress = False
    pruned.save_from_store(out.filename)

    with np.load(full.filename) as a, np.load(pruned.filename) as b:
        keys_a = sorted(a.files)
        assert keys_a == sorted(b.files)
        for key in keys_a:
            if key == 'meta':
                continue
            assert a[key].dtype == b[key].dtype, key
            assert np.array_equal(a[key], b[key]), key
    ra = Output.restore(full.filename)
    rb = Output.restore(pruned.filename)
    assert ra.totalsource == rb.totalsource
    assert list(ra.X.columns) == list(rb.X.columns)
    assert list(ra.X0.columns) == list(rb.X0.columns)


def test_compress_drops_dead_packets():
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out_c = Output(inp, 100, seed=3, compress=True)
    assert np.all(out_c.X.frac > 0)
    out_u = Output(inp, 100, seed=3, compress=False)
    assert len(out_u.X) == 100 * out_u.nsteps
    assert len(out_c.X) < len(out_u.X)  # slow packets die on the surface


def test_input_run_resumes_from_catalog(capsys):
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')), 600.0)
    inp.run(100, packs_per_it=50, seed=11)
    ids, files, npackets, _ = inp.search()
    assert npackets == 100 and len(files) == 2
    # second call finds everything already done
    inp.run(100, packs_per_it=50, seed=11)
    ids2, files2, npackets2, _ = inp.search()
    assert npackets2 == 100 and len(files2) == 2
    # asking for more only runs the difference
    inp.run(150, packs_per_it=50, seed=11)
    _, files3, npackets3, _ = inp.search()
    assert npackets3 == 150 and len(files3) == 3
    # overwrite clears and reruns
    inp.run(50, packs_per_it=50, overwrite=True, seed=11)
    _, files4, npackets4, _ = inp.search()
    assert npackets4 == 50 and len(files4) == 1


def test_adaptive_output_run():
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')), 2000.0)
    inp.options.step_size = 0.0
    inp.options.resolution = 1e-5
    out = Output(inp, 100, seed=5, compress=False)
    X = out.X
    assert len(X) == 100  # one row per packet in adaptive mode
    live = X.frac > 0
    assert live.sum() > 5
    # adaptive packets integrate to t <= resolution
    assert np.all(X.loc[live, 'time'] <= 1e-5 + 1e-9)
    # energy conservation final vs initial
    gm = out.GM
    X0 = out.X0
    e0 = (0.5 * (X0.vx ** 2 + X0.vy ** 2 + X0.vz ** 2) +
          gm / np.sqrt(X0.x ** 2 + X0.y ** 2 + X0.z ** 2))
    e1 = (0.5 * (X.vx ** 2 + X.vy ** 2 + X.vz ** 2) +
          gm / np.sqrt(X.x ** 2 + X.y ** 2 + X.z ** 2))
    rel = np.abs((e1 - e0) / e0)[live]
    assert np.max(rel) < 1e-4
    # totalsource is NOT multiplied by nsteps in adaptive mode
    assert out.totalsource == 100.0


def test_adaptive_resolution_default_on_postparse_mutation():
    """QUIRKS F30: switching a parsed const-step Input to adaptive mode
    (step_size = 0) without setting resolution uses the parse-time default
    1e-4 instead of crashing on resolution=None (the reference TypeErrors,
    Output.py:235-238)."""
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')),
                  1000.0)
    assert inp.options.resolution is None     # parsed as const-step
    inp.options.step_size = 0.0
    out = Output(inp, 50, seed=5, compress=False)
    X = out.X
    assert len(X) == 50
    live = X.frac > 0
    # integrated to the default resolution, not to None
    assert np.all(X.loc[live, 'time'] <= 1e-4 + 1e-9)


def test_large_save_skips_deflate_and_restores(monkeypatch, tmp_path):
    """Stores above _SAVE_COMPRESS_MAX are written without zlib (f32 MC
    noise deflates ~17% for ~6x the write time — measured at 16M packets)
    and np.load restores them identically."""
    import zipfile
    from nexoclom_tpu.particle_tracking import output as out_mod

    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')),
                  600.0)
    ref = Output(inp, 40, seed=3, compress=False)

    monkeypatch.setattr(out_mod, '_SAVE_COMPRESS_MAX', 0)
    inp2 = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')),
                   600.0)
    inp2.geometry.taa = 0.37          # distinct catalog entry
    big = Output(inp2, 40, seed=3, compress=False)
    with zipfile.ZipFile(big.filename) as zf:
        assert all(zi.compress_type == zipfile.ZIP_STORED
                   for zi in zf.infolist())
    restored = Output.restore(big.filename)
    import pandas.testing as pdt
    pdt.assert_frame_equal(restored.X.reset_index(drop=True),
                           big.X.reset_index(drop=True),
                           check_dtype=False, atol=1e-6)


def test_run_model_false_catalogs_placeholder():
    inp = _shrink(Input(os.path.join(INPUTFILES, 'mercury_gravity.input')))
    out = Output(inp, 500, run_model=False)
    assert out.totalsource == 500.0
    _, _, npackets, _ = inp.search()
    assert npackets == 500
