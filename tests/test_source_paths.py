"""End-to-end coverage of the remaining source-distribution paths: surface
maps (1-D and 2-D, solar- and planet-fixed), user-defined speed files,
gaussian speeds, 2d angular distributions, and unimplemented-geometry
errors."""
import math
import os
import pickle

import numpy as np
import pytest
from scipy import stats

from nexoclom_tpu.initial_state import Input, SourceMap
from nexoclom_tpu.initial_state.sampling import build_initial_state
from nexoclom_tpu.initial_state.sections import (AngularDist, Geometry,
                                                 SpatialDist, SpeedDist)
from nexoclom_tpu.utilities.exceptions import InputError

pytestmark = pytest.mark.initial_state

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _base_inputs():
    return Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))


def test_surface_map_2d_sampling(tmp_path):
    """2-D abundance map: packets concentrate where the map does."""
    lon = np.linspace(0, 2 * np.pi, 73)
    lat = np.linspace(-np.pi / 2, np.pi / 2, 37)
    abundance = np.exp(-((lon[:, None] - np.pi) ** 2) / 0.3 -
                       (lat[None, :] ** 2) / 0.1)
    mapfile = tmp_path / 'map2d.pkl'
    with open(mapfile, 'wb') as f:
        pickle.dump({'abundance': abundance, 'longitude': lon,
                     'latitude': lat, 'coordinate_system': 'solar-fixed'}, f)

    inp = _base_inputs()
    inp.spatialdist = SpatialDist({'type': 'surface map',
                                   'mapfile': str(mapfile)})
    x0 = build_initial_state(inp, 20000, seed=8)
    lons = np.asarray(x0['longitude'])
    lats = np.asarray(x0['latitude'])
    # anti-solar spot at lon=pi dominates
    assert abs(np.median(lons) - np.pi) < 0.1
    assert abs(np.median(lats)) < 0.05
    # note: map sampling density is on (lon, sin lat) as in the reference
    assert np.std(lats) < 0.45


def test_surface_map_1d_sampling(tmp_path):
    """Longitude-only map: latitude pinned to zero."""
    lon = np.linspace(0, 2 * np.pi, 181)
    abundance = 1.0 + np.cos(lon - np.pi / 2)
    mapfile = tmp_path / 'map1d.pkl'
    with open(mapfile, 'wb') as f:
        pickle.dump({'abundance': abundance, 'longitude': lon}, f)
    inp = _base_inputs()
    inp.spatialdist = SpatialDist({'type': 'surface map',
                                   'mapfile': str(mapfile)})
    x0 = build_initial_state(inp, 20000, seed=9)
    assert np.all(np.asarray(x0['latitude']) == 0.0)
    lons = np.asarray(x0['longitude'])
    cdf_vals = np.cumsum(abundance)
    cdf_vals = (cdf_vals - cdf_vals[0]) / (cdf_vals[-1] - cdf_vals[0])
    _, p = stats.kstest(lons, lambda x: np.interp(x, lon, cdf_vals))
    assert p > 0.01


def test_surface_map_planet_fixed_rotation(tmp_path):
    """Planet-fixed maps rotate by the subsolar longitude
    (source_distribution.py:85-91; unverified in the reference)."""
    lon = np.linspace(0, 2 * np.pi, 181)
    abundance = np.exp(-((lon - np.pi) ** 2) / 0.05)   # spot at lon_pf = pi
    mapfile = tmp_path / 'pf.pkl'
    with open(mapfile, 'wb') as f:
        pickle.dump({'abundance': abundance, 'longitude': lon,
                     'coordinate_system': 'planet-fixed'}, f)
    inp = _base_inputs()
    subsolarlon = 1.0
    inp.spatialdist = SpatialDist({'type': 'surface map',
                                   'mapfile': str(mapfile),
                                   'subsolarlon': str(subsolarlon),
                                   'coordinate_system': 'planet-fixed'})
    x0 = build_initial_state(inp, 5000, seed=10)
    lons = np.asarray(x0['longitude'])
    expected = (subsolarlon - np.pi) % (2 * np.pi)
    # circular median of the rotated spot
    med = math.atan2(np.mean(np.sin(lons)), np.mean(np.cos(lons))) % \
        (2 * math.pi)
    assert abs(med - expected) < 0.1

    # planet-fixed without subsolarlon raises
    inp.spatialdist.subsolarlon = None
    with pytest.raises(InputError):
        build_initial_state(inp, 10, seed=1)


def test_user_defined_speed(tmp_path):
    speeds = np.linspace(0.5, 3.0, 200)
    dist = np.exp(-((speeds - 1.5) ** 2) / 0.08)
    vfile = tmp_path / 'vdist.pkl'
    with open(vfile, 'wb') as f:
        pickle.dump({'speed': speeds, 'speed_dist': dist}, f)
    inp = _base_inputs()
    inp.speeddist = SpeedDist({'type': 'user defined',
                               'vdistfile': str(vfile)})
    x0 = build_initial_state(inp, 20000, seed=11)
    v_kms = np.asarray(x0['v']) * inp.geometry.planet.radius
    assert abs(v_kms.mean() - 1.5) < 0.02
    assert 0.5 - 1e-6 <= v_kms.min() and v_kms.max() <= 3.0 + 1e-6


def test_gaussian_speed_end_to_end():
    inp = _base_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '2.5',
                               'sigma': '0.25'})
    x0 = build_initial_state(inp, 20000, seed=12)
    v_kms = np.asarray(x0['v']) * inp.geometry.planet.radius
    _, p = stats.kstest(v_kms, 'norm', args=(2.5, 0.25))
    assert p > 0.01


def test_2d_angular_end_to_end():
    inp = _base_inputs()
    inp.angulardist = AngularDist({'type': '2d'})
    x0 = build_initial_state(inp, 5000, seed=13)
    assert np.allclose(np.asarray(x0['vz']), 0.0)
    # speed magnitude preserved in-plane
    v = np.sqrt(np.asarray(x0['vx']) ** 2 + np.asarray(x0['vy']) ** 2)
    assert np.allclose(v, np.asarray(x0['v']), rtol=1e-6)


def test_radial_angular_end_to_end():
    inp = _base_inputs()
    inp.angulardist = AngularDist({'type': 'radial'})
    x0 = build_initial_state(inp, 2000, seed=14)
    vdotr = (np.asarray(x0['vx']) * np.asarray(x0['x']) +
             np.asarray(x0['vy']) * np.asarray(x0['y']) +
             np.asarray(x0['vz']) * np.asarray(x0['z']))
    v = np.asarray(x0['v'])
    assert np.allclose(vdotr, v, rtol=1e-6)   # purely radial (r=1)


def test_geometry_with_starttime_runs():
    """Time-stamped geometry derives the TAA by Kepler propagation and runs
    (the reference asserts NotImplementedError here, Output.py:95-96)."""
    from nexoclom_tpu.particle_tracking import Output
    from nexoclom_tpu.solarsystem.planet_geometry import true_anomaly_at_time
    inp = _base_inputs()
    inp.options.endtime = 300.0
    inp.geometry = Geometry({'planet': 'Mercury',
                             'starttime': '2026-08-16T00:00:00'})
    out = Output(inp, 50, seed=3)
    expected_taa = true_anomaly_at_time('2026-08-16T00:00:00', 'Mercury')
    assert out.taa == pytest.approx(expected_taa)
    assert 0.30 < out.aplanet < 0.47
    assert len(out.X) > 0
    # cataloged and searchable by the exact timestamp
    ids, files, n, _ = inp.search()
    assert n == 50


def test_exobase_scaling():
    inp = _base_inputs()
    inp.spatialdist = SpatialDist({'type': 'uniform', 'exobase': '1.5'})
    x0 = build_initial_state(inp, 1000, seed=15)
    r = np.sqrt(np.asarray(x0['x']) ** 2 + np.asarray(x0['y']) ** 2 +
                np.asarray(x0['z']) ** 2)
    assert np.allclose(r, 1.5, atol=1e-6)


def test_maxwellian_surface_temperature_map():
    """temperature=0 maxwellian: per-packet speed at the launch point's
    local surface temperature (the reference asserts 'Need to write this',
    source_distribution.py:165-168 — quirk F15)."""
    from nexoclom_tpu.atomicdata import atomicmass
    from nexoclom_tpu.constants import thermal_speed_kms
    from nexoclom_tpu.initial_state.surface_temperature import (
        surface_temperature)

    taa = _base_inputs().geometry.taa

    def speeds_at(lon0):
        inp = _base_inputs()
        inp.speeddist = SpeedDist({'type': 'maxwellian', 'temperature': '0'})
        inp.spatialdist = SpatialDist({'type': 'surface spot',
                                       'longitude': str(lon0),
                                       'latitude': '0', 'sigma': '0.02'})
        x0 = build_initial_state(inp, 30000, seed=77)
        return np.asarray(x0['v']) * inp.geometry.planet.radius  # km/s

    # tight subsolar spot: one well-defined temperature -> KS against the
    # table-implied flux-Maxwellian law (same construction as the bounce
    # re-emission test)
    v_sub = speeds_at(0.0)
    tsub = float(surface_temperature(np.array([0.0]), np.array([0.0]),
                                     taa)[0])
    vth = thermal_speed_kms(tsub, atomicmass('Na'))
    vrange = np.linspace(0.0, 3 * vth, 101)
    f_v = vrange ** 3 * np.exp(-vrange ** 2 / vth ** 2)
    cum = np.cumsum(f_v)
    cum = (cum - cum.min()) / (cum.max() - cum.min())
    _, p = stats.kstest(v_sub, lambda v: np.interp(v, vrange, cum))
    assert p > 0.005

    # nightside (100 K) launches are much slower than subsolar
    v_night = speeds_at(math.pi)
    assert v_night.mean() < 0.5 * v_sub.mean()


def test_maxwellian_t0_requires_surface_launch():
    inp = _base_inputs()
    inp.speeddist = SpeedDist({'type': 'maxwellian', 'temperature': '0'})
    x0 = build_initial_state(inp, 100, seed=1)   # uniform surface: fine
    assert np.all(np.asarray(x0['v']) > 0)
