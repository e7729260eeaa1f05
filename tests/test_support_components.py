"""Tests for the support components: spherical histograms, time-based
geometry, atomic-data table builders, sweep runner, tracing."""
import math
import os

import numpy as np
import pytest

pytestmark = pytest.mark.utilities


def test_histogram_sphere_uniform():
    from nexoclom_tpu.mathutils.histograms import HistogramSphere
    rng = np.random.default_rng(1)
    n = 20000
    lon = rng.uniform(0, 2 * np.pi, n)
    lat = np.arcsin(rng.uniform(-1, 1, n))
    hist = HistogramSphere(lon, lat, dphi=np.deg2rad(10), bins=(36, 18))
    # uniform sphere density: cap counts roughly constant over the sphere
    counts = hist.histogram
    assert counts.shape == (18, 36)
    mid = counts[4:14, :]   # avoid polar cells (smaller effective caps)
    assert mid.std() / mid.mean() < 0.2
    # weights halve the counts
    hw = HistogramSphere(lon, lat, weights=np.full(n, 0.5),
                         dphi=np.deg2rad(10), bins=(36, 18))
    assert np.allclose(hw.histogram, 0.5 * counts)


def test_planet_geometry_from_time():
    from nexoclom_tpu.solarsystem.planet_geometry import (planet_geometry,
                                                          true_anomaly_at_time)
    # Mercury perihelion within its known range of dates; spot check that the
    # returned r spans [a(1-e), a(1+e)] over one orbit
    from datetime import datetime, timedelta, timezone
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rs = []
    for day in range(0, 88, 2):
        r, vr, taa = planet_geometry(t0 + timedelta(days=day), 'Mercury')
        rs.append(r)
        assert 0 <= taa < 2 * math.pi
    assert min(rs) < 0.313 and max(rs) > 0.46   # peri ~0.3075, apo ~0.4667
    # ISO string input works
    r, vr, taa = planet_geometry('2026-08-16T00:00:00', 'Mercury')
    assert 0.3 < r < 0.47
    with pytest.raises(NotImplementedError):
        true_anomaly_at_time(t0, 'Pluto')


def test_initialize_atomicdata_roundtrip(tmp_path):
    from nexoclom_tpu.atomicdata.initialize_atomicdata import (
        make_gvalue_table, make_photorates_table, parse_gvalue_csv)
    # write a tiny synthetic .dat in the reference format
    dat = tmp_path / 'Xx.test.dat'
    dat.write_text('a = 0.352\n'
                   'vel\t:\t1000\t:\t2000\n'
                   '-1\t:\t0.1\t:\t0.2\n'
                   '0\t:\t0.3\t:\t0.4\n'
                   '1\t:\t0.5\t:\t0.6\n')
    out = tmp_path / 'gvalues.csv'
    table = make_gvalue_table(str(tmp_path), str(out))
    assert len(table) == 6
    assert set(table.wavelength) == {1000.0, 2000.0}
    assert (table.refpoint == 0.352).all()
    row = table[(table.wavelength == 2000.0) & (table.velocity == 0.0)]
    assert float(row.gvalue.iloc[0]) == 0.4

    csv = tmp_path / 'Yy.csv'
    csv.write_text('velocity,1234\n-1,0.5\n1,0.7\n')
    t2 = parse_gvalue_csv(str(csv), 'Yy', 1234.0)
    assert len(t2) == 2 and (t2.refpoint == 0.352).all()

    photo = tmp_path / 'photo'
    photo.mkdir()
    (photo / 'rates.dat').write_text(
        'Someone 2020 // REFERENCE\n'
        '\\begindata\n'
        'Xx : Xx, photon -> Xx+, e : 1e-5 : 0\n'
        'Xx : Xx, photon -> Xx+, e : 2e-5 : 0\n'
        'Yy : Yy, photon -> Yy+, e : 3e-5 : 0\n'
        '\\enddata\n')
    pt = make_photorates_table(str(photo), str(tmp_path / 'photorates.csv'))
    assert len(pt) == 3
    assert list(pt.best_version) == [True, False, True]
    assert (pt.reference == 'Someone 2020').all()


def test_step_rate_timer():
    import jax.numpy as jnp
    from nexoclom_tpu.utilities.tracing import StepRateTimer
    timer = StepRateTimer()
    with timer.region(packet_steps=1000) as region:
        value = jnp.arange(10.0)
        region.barrier(value)
    assert timer.total_packet_steps == 1000
    assert timer.rate() > 0
    assert 'packet-steps' in timer.summary()


def test_run_sweep_subprocess(tmp_path):
    """Two tiny configurations through the process-pool sweep runner,
    joining in the shared catalog."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.utilities.config import get_config

    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp1 = Input(os.path.join(inputfiles, 'mercury_gravity.input'))
    inp1.options.endtime = 300.0
    inp2 = Input(os.path.join(inputfiles, 'mercury_gravity.input'))
    inp2.options.endtime = 600.0

    from nexoclom_tpu.utilities.sweep import run_sweep
    savepath = get_config().savepath
    codes = run_sweep([inp1, inp2], npackets=100, njobs=2, seed=5,
                      env={'NEXOCLOM_SAVEPATH': savepath,
                           'NEXOCLOM_TPU_CONFIG': '',
                           'JAX_PLATFORMS': 'cpu'})
    assert codes == [0, 0]
    _, _, n1, _ = inp1.search()
    _, _, n2, _ = inp2.search()
    assert n1 == 100 and n2 == 100
    # resumable: re-running finds everything done
    codes = run_sweep([inp1], npackets=100, njobs=1, seed=5,
                      env={'NEXOCLOM_SAVEPATH': savepath,
                           'NEXOCLOM_TPU_CONFIG': '',
                           'JAX_PLATFORMS': 'cpu'})
    assert codes == [0]


def test_magcoord_stub():
    from nexoclom_tpu.particle_tracking.magcoord import xyz_to_magcoord
    assert xyz_to_magcoord(0, None, None, 'Mercury') is None
    with pytest.raises(NotImplementedError):
        xyz_to_magcoord(0, None, None, 'Jupiter')
    # satellite start points are implemented now (tests/test_satellites.py)


def test_idl_import(tmp_path):
    """IDLout reads scipy-writable .sav files with packet arrays."""
    from scipy.io import savemat
    pytest.importorskip('scipy.io')
    # scipy can read but not write .sav; simulate with readsav monkeypatch
    import nexoclom_tpu.particle_tracking.idl_import as idl

    fake = {'x': np.arange(3.0), 'y': np.arange(3.0) + 1,
            'z': np.zeros(3), 'frac': np.ones(3), 'meta_info': 42}

    class _FakeReadsav:
        def __call__(self, path, python_dict=True):
            return dict(fake)

    real = None
    try:
        import scipy.io as sio
        real = sio.readsav
    except Exception:
        pass
    import scipy.io as sio
    sio.readsav = _FakeReadsav()
    try:
        out = idl.IDLout('dummy.sav')
        assert list(out.X.columns) == ['x', 'y', 'z', 'frac']
        assert out.npackets == 3
        assert out.meta['meta_info'] == 42
    finally:
        if real is not None:
            sio.readsav = real


def test_debug_validators(monkeypatch):
    import pandas as pd
    from nexoclom_tpu.utilities import debug

    frame = pd.DataFrame({'x': [2.0], 'y': [0.0], 'z': [0.0],
                          'vx': [0.0], 'vy': [0.0], 'vz': [0.0],
                          'frac': [0.5]})
    debug.validate_packet_frame(frame)          # clean

    bad = frame.assign(frac=[-0.1])
    with pytest.raises(debug.ValidationError):
        debug.validate_packet_frame(bad)
    below = frame.assign(x=[0.5], frac=[1.0])
    with pytest.raises(debug.ValidationError):
        debug.validate_packet_frame(below)
    nan = frame.assign(vy=[float('nan')])
    with pytest.raises(debug.ValidationError):
        debug.validate_packet_frame(nan)

    monkeypatch.setenv('NEXOCLOM_DEBUG', '1')
    assert debug.debug_enabled()
    monkeypatch.setenv('NEXOCLOM_DEBUG', '0')
    assert not debug.debug_enabled()


def test_debug_mode_end_to_end(monkeypatch):
    """NEXOCLOM_DEBUG=1 validates every Output on save."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    monkeypatch.setenv('NEXOCLOM_DEBUG', '1')
    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(inputfiles, 'mercury_gravity.input'))
    inp.options.endtime = 300.0
    out = Output(inp, 50, seed=1)   # passes validation
    assert out.npackets == 50


def test_bench_pool_rep_policy():
    """The bench pool stage's stop rule (bench.py::pool_stage_should_stop):
    converged-within-2.5% AND anchored reps stop at 3; a uniformly loaded
    host (converged but off-anchor, the bench_r5_run5.json failure mode)
    keeps extending until the bounded budget; convergence alone suffices
    past 7 reps."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        from bench import pool_stage_should_stop
    finally:
        sys.path.pop(0)

    anchor = 62.0
    # quiet host: three reps near the anchor, two fastest within 2.5%
    assert pool_stage_should_stop([61.3, 61.6, 62.8], anchor_s=anchor)
    # too few reps never stop, however fast
    assert not pool_stage_should_stop([60.0, 60.1], anchor_s=anchor)
    # loaded host (run-5 shape): converged at 67.5/69.0 but 9% off anchor
    # -> keep extending through reps 3..6
    run5 = [71.9, 79.1, 90.8, 69.0, 70.9, 67.5]
    for k in range(3, len(run5) + 1):
        assert not pool_stage_should_stop(run5[:k], anchor_s=anchor)
    # ...but once 7 reps are spent, convergence alone ends the stage
    assert pool_stage_should_stop(run5 + [68.1], anchor_s=anchor)
    # 7+ reps without convergence still extend
    assert not pool_stage_should_stop([70, 80, 90, 85, 88, 91, 95],
                                      anchor_s=anchor)
    # an anchored quiet window found late stops immediately
    assert pool_stage_should_stop([70.0, 80.0, 61.0, 61.9],
                                  anchor_s=anchor)
