"""Every vendored input fixture parses, and every runnable configuration
runs end-to-end at small scale — the breadth of the reference's
tests/test_data/inputfiles set (19 files) PLUS its shipped fitted inputs
(data/InputFiles/{Ca,Na,Mg}.fitted.input — the 'fitted output' shape),
routed through on-disk map files of the reference's real shapes (bin-edge
grids + bin-valued abundance)."""
import glob
import os

import numpy as np
import pytest

from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.particle_tracking import Output
from nexoclom_tpu.utilities.exceptions import InputError

pytestmark = pytest.mark.initial_state

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
ALL_FIXTURES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(INPUTFILES, '*.input')))

# configurations that cannot run (and why)
RUN_RAISES = {
    'mercury_stick_map_default.input': InputError,       # no mapfile
    # fitted inputs describe a REWEIGHTING of an existing unfit run
    # (LOSResultFitted); they parse and catalog but cannot seed packets
    'mercury_ca_fitted.input': InputError,
    'mercury_na_fitted.input': InputError,
}
SLOW_ADAPTIVE = {  # adaptive fixtures get a short endtime in the run test
    'mercury_uniform_flat.input', 'mercury_forces_nogravity.input',
    'mercury_forces_noradpres.input', 'mercury_uniform_band.input',
    'mercury_stick_partial_accom.input', 'mercury_stick_tempdep.input',
    'mercury_stick_tempdep_custom.input', 'mercury_stick_map_file.input',
    'mercury_na_bounce.input',
}


def test_fixture_count_matches_reference_breadth():
    # 19 test_data inputfiles + the fitted-input family (data/InputFiles)
    assert len(ALL_FIXTURES) >= 21


@pytest.mark.parametrize('name', ALL_FIXTURES)
def test_fixture_parses(name):
    inp = Input(os.path.join(INPUTFILES, name))
    assert inp.options.species
    assert inp.geometry.planet.object


@pytest.mark.parametrize('name', sorted(RUN_RAISES))
def test_unrunnable_fixture_raises(name):
    inp = Input(os.path.join(INPUTFILES, name))
    with pytest.raises(RUN_RAISES[name]):
        Output(inp, 10, seed=1)


@pytest.mark.parametrize('name',
                         [f for f in ALL_FIXTURES if f not in RUN_RAISES])
def test_fixture_runs(name):
    inp = Input(os.path.join(INPUTFILES, name))
    inp.options.endtime = 600.0 if name in SLOW_ADAPTIVE else 1200.0
    if inp.options.step_size == 0:
        inp.options.resolution = 1e-3
    out = Output(inp, 64, seed=11)
    assert len(out.X) > 0
    frac = out.X.frac.to_numpy()
    assert np.all(np.isfinite(frac))
    # frac can overshoot 1 by ~5e-3 when an RK step straddles the shadow
    # boundary (negative Butcher weights against the discontinuous
    # ionization mask) — same in the reference's log-frac integration
    assert np.all((frac >= 0) & (frac <= 1.0 + 5e-3))


def test_surfacemap_fixture_follows_map():
    """The on-disk dawn-enhanced map concentrates launches at dawn, through
    the R5 edge-grid regridding."""
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    inp = Input(os.path.join(INPUTFILES, 'mercury_ca_surfacemap.input'))
    x0 = build_initial_state(inp, 20000, seed=4)
    lon = np.asarray(x0['longitude'])
    # map peaks at dawn terminator (lon = 3pi/2 = 4.712)
    circ_mean = np.angle(np.exp(1j * lon).mean()) % (2 * np.pi)
    assert abs(circ_mean - 4.712) < 0.15


def test_planetfixed_surfacemap_rotates():
    """Planet-fixed map + subsolarlon=2.5: the dawn peak (map-longitude
    4.712) appears at solar-fixed (2.5 - 4.712) mod 2pi."""
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    inp = Input(os.path.join(INPUTFILES,
                             'mercury_na_surfacemap_planetfixed.input'))
    x0 = build_initial_state(inp, 20000, seed=4)
    lon = np.asarray(x0['longitude'])
    expected = (2.5 - 4.712) % (2 * np.pi)
    circ_mean = np.angle(np.exp(1j * lon).mean()) % (2 * np.pi)
    assert abs(circ_mean - expected) < 0.15


def test_sticking_map_fixture_normalised():
    """The abundance-style sticking map (values 2.9..51.4) normalises to
    max -> dayside sticks least (map minimum at lon=pi... the map peaks at
    night side lon=pi)."""
    from nexoclom_tpu.ops.surface import build_sticking_map
    from nexoclom_tpu.initial_state.sourcemap import SourceMap
    mapfile = os.path.join(os.path.dirname(__file__), 'data',
                           'sticking_maps', 'orbit_ca_sticking.pkl')
    table, lon0, dlon, lat0, dlat = build_sticking_map(SourceMap(mapfile))
    assert table.max() == pytest.approx(1.0)
    # min ~ 2.9/51.4, up to the R5 uniform-axis regrid of the edge grids
    assert table.min() == pytest.approx(2.9 / 51.4, rel=0.02)
    # night side (lon=pi) sticks most
    i_night = int(round((np.pi - lon0) / dlon))
    i_day = 0
    assert table[i_night].mean() > table[i_day].mean()
