"""Surface-interaction physics tests: bounce geometry, energy conservation,
accommodation statistics, sticking modes, and end-to-end bouncing runs."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from nexoclom_tpu.initial_state.surface_temperature import surface_temperature
from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                         SurfaceTable, constant_step_driver,
                                         empty_force_table)
from nexoclom_tpu.ops.surface import bounce_packets, build_emission_speed_table

pytestmark = pytest.mark.particle_tracking

GM = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3
RADIUS_KM = 2440.53
KEY = jax.random.PRNGKey(11)


def _surface_table(stickcoef=0.0, accomfactor=0.0, taa=0.0,
                   A=(0.0, 0.0, 0.0), species='Na'):
    if accomfactor:
        v_table, t0, dt = build_emission_speed_table(taa, species, RADIUS_KM)
    else:
        v_table, t0, dt = np.zeros((2, 2)), 0.0, 1.0
    return SurfaceTable(stickcoef=jnp.asarray(stickcoef),
                        accomfactor=jnp.asarray(accomfactor),
                        stick_A=jnp.asarray(A), taa=jnp.asarray(taa),
                        v_table=jnp.asarray(v_table),
                        temp0=jnp.asarray(t0), dtemp=jnp.asarray(dt))


def _impacting_state(n=1000, depth=0.02, v_kms=2.0):
    """Packets that have just crossed the surface moving inward radially."""
    rng = np.random.default_rng(0)
    lon = rng.uniform(0, 2 * np.pi, n)
    lat = np.arcsin(rng.uniform(-1, 1, n))
    r = 1.0 - depth
    x = r * np.sin(lon) * np.cos(lat)
    y = -r * np.cos(lon) * np.cos(lat)
    z = r * np.sin(lat)
    v = v_kms / RADIUS_KM
    return PacketState(
        t=jnp.full(n, 1000.0), x=jnp.asarray(x), y=jnp.asarray(y),
        z=jnp.asarray(z),
        vx=jnp.asarray(-v * x / r), vy=jnp.asarray(-v * y / r),
        vz=jnp.asarray(-v * z / r),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))


def test_bounce_moves_to_surface():
    state = _impacting_state()
    spec = EngineSpec(surface_bounce=True, accom=False)
    hit = jnp.ones(state.x.shape, bool)
    out = bounce_packets(KEY, state, hit, spec, _surface_table(),
                         jnp.asarray(GM), RADIUS_KM)
    r = np.sqrt(np.asarray(out.x) ** 2 + np.asarray(out.y) ** 2 +
                np.asarray(out.z) ** 2)
    assert np.allclose(r, 1.0, atol=1e-9)
    # outbound after the bounce
    vdotr = (np.asarray(out.vx) * np.asarray(out.x) +
             np.asarray(out.vy) * np.asarray(out.y) +
             np.asarray(out.vz) * np.asarray(out.z))
    assert np.all(vdotr > 0)


def test_elastic_bounce_conserves_energy():
    """accomfactor=0: rebound speed follows from energy conservation between
    the overshoot point and the surface (bouncepackets.py:59-66)."""
    depth, v_kms = 0.02, 2.0
    state = _impacting_state(depth=depth, v_kms=v_kms)
    spec = EngineSpec(surface_bounce=True, accom=False)
    hit = jnp.ones(state.x.shape, bool)
    out = bounce_packets(KEY, state, hit, spec, _surface_table(),
                         jnp.asarray(GM), RADIUS_KM)
    v_in2 = (v_kms / RADIUS_KM) ** 2
    expected2 = v_in2 + 2 * GM * (1.0 / (1.0 - depth) - 1.0)
    v_out = np.sqrt(np.asarray(out.vx) ** 2 + np.asarray(out.vy) ** 2 +
                    np.asarray(out.vz) ** 2)
    assert np.allclose(v_out ** 2, expected2, rtol=1e-10)
    # no sticking: frac unchanged
    assert np.allclose(np.asarray(out.frac), 1.0)


def test_constant_sticking_reduces_frac():
    state = _impacting_state(n=100)
    spec = EngineSpec(surface_bounce=True, accom=False)
    hit = jnp.ones(state.x.shape, bool)
    out = bounce_packets(KEY, state, hit, spec,
                         _surface_table(stickcoef=0.3),
                         jnp.asarray(GM), RADIUS_KM)
    assert np.allclose(np.asarray(out.frac), 0.7)
    # unhit packets untouched
    half = jnp.arange(100) < 50
    out2 = bounce_packets(KEY, state, half, spec,
                          _surface_table(stickcoef=0.3),
                          jnp.asarray(GM), RADIUS_KM)
    frac2 = np.asarray(out2.frac)
    assert np.allclose(frac2[:50], 0.7) and np.allclose(frac2[50:], 1.0)


def test_temperature_dependent_sticking():
    """S(T) = clip(A0 e^{A1 T} + A2): hot subsolar surface sticks less with
    the default Na coefficients (A1 < 0)."""
    n = 400
    A = (1.57014, -0.006262, 0.1614157)
    spec = EngineSpec(surface_bounce=True, accom=False,
                      sticktype='temperature dependent')
    table = _surface_table(A=A, taa=0.0)

    def frac_at(lon):
        r = 1.0 - 0.01
        x = r * math.sin(lon)
        y = -r * math.cos(lon)
        state = PacketState(
            t=jnp.full(n, 100.0), x=jnp.full(n, x), y=jnp.full(n, y),
            z=jnp.zeros(n),
            vx=jnp.full(n, -math.sin(lon) * 1e-3),
            vy=jnp.full(n, math.cos(lon) * 1e-3), vz=jnp.zeros(n),
            frac=jnp.ones(n), lossfrac=jnp.zeros(n))
        out = bounce_packets(KEY, state, jnp.ones(n, bool), spec, table,
                             jnp.asarray(GM), RADIUS_KM)
        return float(np.asarray(out.frac).mean())

    frac_subsolar = frac_at(0.0)      # T ~ 725 K at TAA=0
    frac_night = frac_at(math.pi)     # T = 100 K
    t_sub = surface_temperature(np.array([0.0]), np.array([0.0]), 0.0)[0]
    t_night = surface_temperature(np.array([math.pi]), np.array([0.0]),
                                  0.0)[0]
    s_sub = np.clip(A[0] * np.exp(A[1] * t_sub) + A[2], 0, 1)
    s_night = np.clip(A[0] * np.exp(A[1] * t_night) + A[2], 0, 1)
    assert np.isclose(frac_subsolar, 1 - s_sub, atol=1e-6)
    assert np.isclose(frac_night, 1 - s_night, atol=1e-6)
    assert frac_subsolar > frac_night   # hot surface sticks less


def test_accommodated_emission_speed_distribution():
    """Full accommodation (af=1): re-emitted speeds follow the local-
    temperature Maxwellian flux distribution (KS test)."""
    n = 30000
    # all impacts at the subsolar point -> one well-defined temperature
    depth = 1e-6
    r = 1.0 - depth
    state = PacketState(
        t=jnp.full(n, 100.0), x=jnp.zeros(n), y=jnp.full(n, -r),
        z=jnp.zeros(n), vx=jnp.zeros(n),
        vy=jnp.full(n, 1e-7), vz=jnp.zeros(n),   # slow inward -> v_old ~ 0
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    spec = EngineSpec(surface_bounce=True, accom=True)
    table = _surface_table(accomfactor=1.0, taa=0.0, species='Na')
    out = bounce_packets(KEY, state, jnp.ones(n, bool), spec, table,
                         jnp.asarray(GM), RADIUS_KM)
    v_kms = np.sqrt(np.asarray(out.vx) ** 2 + np.asarray(out.vy) ** 2 +
                    np.asarray(out.vz) ** 2) * RADIUS_KM

    from nexoclom_tpu.atomicdata import atomicmass
    from nexoclom_tpu.constants import thermal_speed_kms
    tsurf = float(surface_temperature(np.array([0.0]), np.array([0.0]),
                                      0.0)[0])
    vth = thermal_speed_kms(tsurf, atomicmass('Na'))

    # The table quantizes the CDF with the reference's 101-point cumsum
    # construction (SurfaceInteraction.py:47-54), which shifts the analytic
    # CDF by up to half a speed bin — so compare against the table-implied
    # law, plus a moment check against the analytic distribution.
    vrange = np.linspace(0.0, 3 * vth, 101)
    f_v = vrange ** 3 * np.exp(-vrange ** 2 / vth ** 2)
    cum = np.cumsum(f_v)
    cum = (cum - cum.min()) / (cum.max() - cum.min())
    _, p = stats.kstest(v_kms, lambda v: np.interp(v, vrange, cum))
    assert p > 0.005

    mean_expected = np.trapezoid(f_v * vrange, vrange) / \
        np.trapezoid(f_v, vrange)
    assert abs(v_kms.mean() - mean_expected) / mean_expected < 0.02


def test_end_to_end_bouncing_run_conserves_mass():
    """stick=0, elastic: packets bounce forever; total frac only decays by
    photo loss, never by the surface."""
    rng = np.random.default_rng(5)
    n = 256
    lon = rng.uniform(0, 2 * np.pi, n)
    lat = np.arcsin(rng.uniform(-1, 1, n))
    x, y, z = (np.sin(lon) * np.cos(lat), -np.cos(lon) * np.cos(lat),
               np.sin(lat))
    v = 1.5 / RADIUS_KM     # below escape: guaranteed return
    state0 = PacketState(
        t=jnp.full(n, 3000.0), x=jnp.asarray(x), y=jnp.asarray(y),
        z=jnp.asarray(z), vx=jnp.asarray(v * x), vy=jnp.asarray(v * y),
        vz=jnp.asarray(v * z), frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    spec = EngineSpec(gravity=True, radpres=False, constant_rate=True,
                      surface_bounce=True, accom=False,
                      check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM), ion_rate=jnp.asarray(0.0))
    nsteps = 101
    final, _ = constant_step_driver(
        state0, spec, forces, _surface_table(stickcoef=0.0), 30.0, 1e30,
        RADIUS_KM, KEY, nsteps=nsteps, save_history=False)
    # zero loss channels: every packet survives with frac 1
    assert np.allclose(np.asarray(final.frac), 1.0)
    r = np.sqrt(np.asarray(final.x) ** 2 + np.asarray(final.y) ** 2 +
                np.asarray(final.z) ** 2)
    assert np.all(r >= 1.0 - 1e-9)


def test_output_bouncing_configuration():
    """Output end-to-end with stickcoef<1 + accommodation (the configuration
    the reference's adaptive driver cannot run)."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(inputfiles, 'mercury_na_spot.input'))
    inp.options.endtime = 1200.0
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    inp.surfaceinteraction = SurfaceInteraction(
        {'stickcoef': '0.5', 'accomfactor': '0.8'})
    out = Output(inp, 200, seed=21)
    assert out.npackets == 200
    fracs = out.X.frac.to_numpy()
    # frac can overshoot 1 by ~3e-4 when an RK step straddles the shadow
    # boundary (negative Butcher weights against the discontinuous
    # ionization mask) — identical in the reference's log-frac integration
    assert np.all((fracs >= 0) & (fracs <= 1.001))
    # some packets bounced (frac in (0,1) strictly from 0.5 sticking)
    assert np.any((fracs > 0) & (fracs < 1.0))


# ---------------------------------------------------------------------------
# Surface-map sticking (works here; the reference asserts on this path,
# bouncepackets.py:90-91)
# ---------------------------------------------------------------------------

def _map_table(stick_map, lon, lat, subsolarlon=0.0, accomfactor=0.0,
               taa=0.0):
    from nexoclom_tpu.ops.surface import build_sticking_map

    class _Map:
        pass
    m = _Map()
    m.abundance, m.longitude, m.latitude = stick_map, lon, lat
    table, lon0, dlon, lat0, dlat = build_sticking_map(m)
    base = _surface_table(accomfactor=accomfactor, taa=taa)
    return base._replace(
        stick_map=jnp.asarray(table), map_lon0=jnp.asarray(lon0),
        map_dlon=jnp.asarray(dlon), map_lat0=jnp.asarray(lat0),
        map_dlat=jnp.asarray(dlat),
        map_subsolarlon=jnp.asarray(subsolarlon))


def test_bilinear_lookup_dense_matches_gather():
    from nexoclom_tpu.ops.surface import bilinear_lookup
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(17, 9)))
    rows = jnp.asarray(rng.uniform(-1.0, 18.0, 500))   # incl. out-of-range
    cols = jnp.asarray(rng.uniform(-1.0, 10.0, 500))
    got_g = np.asarray(bilinear_lookup(table, rows, cols, impl='gather'))
    got_d = np.asarray(bilinear_lookup(table, rows, cols, impl='dense',
                                       block=128))
    np.testing.assert_allclose(got_d, got_g, rtol=1e-12, atol=1e-12)


def test_build_sticking_map_regrids_nonuniform():
    """Non-uniform source grids resample onto a uniform grid; a linear
    function of (lon, lat) is reproduced exactly by bilinear regridding."""
    from nexoclom_tpu.ops.surface import build_sticking_map
    lon = np.array([0.0, 0.5, 2.0, 4.0, 2 * np.pi])
    lat = np.array([-np.pi / 2, -0.3, 0.1, np.pi / 2])
    f = (0.05 * lon[:, None] + 0.1 * (lat[None, :] + np.pi / 2))

    class _Map:
        pass
    m = _Map()
    m.abundance, m.longitude, m.latitude = f, lon, lat
    table, lon0, dlon, lat0, dlat = build_sticking_map(m)
    ulon = lon0 + dlon * np.arange(table.shape[0])
    ulat = lat0 + dlat * np.arange(table.shape[1])
    want = 0.05 * ulon[:, None] + 0.1 * (ulat[None, :] + np.pi / 2)
    np.testing.assert_allclose(table, np.clip(want, 0, 1), rtol=1e-12)


def test_uniform_stick_map_equals_constant_sticking():
    """A constant-abundance map reproduces stickcoef exactly (same key)."""
    state = _impacting_state(n=200)
    hit = jnp.ones(state.x.shape, bool)
    spec_c = EngineSpec(surface_bounce=True, accom=False)
    out_c = bounce_packets(KEY, state, hit, spec_c,
                           _surface_table(stickcoef=0.35),
                           jnp.asarray(GM), RADIUS_KM)
    lon = np.linspace(0, 2 * np.pi, 25)
    lat = np.linspace(-np.pi / 2, np.pi / 2, 13)
    spec_m = EngineSpec(surface_bounce=True, accom=False,
                        sticktype='surface map')
    out_m = bounce_packets(KEY, state, hit, spec_m,
                           _map_table(np.full((25, 13), 0.35), lon, lat),
                           jnp.asarray(GM), RADIUS_KM)
    np.testing.assert_allclose(np.asarray(out_m.frac), np.asarray(out_c.frac),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_m.vx), np.asarray(out_c.vx))


def test_stick_map_spatial_variation():
    """Packets hitting where the map says S=0.8 lose 0.8; where S=0.1, 0.1
    (solar-fixed map: dayside sticks, nightside mostly doesn't)."""
    lon = np.linspace(0, 2 * np.pi, 361)
    lat = np.linspace(-np.pi / 2, np.pi / 2, 181)
    smap = np.where((lon[:, None] < np.pi / 2) | (lon[:, None] > 3 * np.pi / 2),
                    0.8, 0.1) * np.ones((1, lat.size))
    table = _map_table(smap, lon, lat)
    spec = EngineSpec(surface_bounce=True, accom=False,
                      sticktype='surface map')

    def frac_at(lon_hit):
        n = 50
        r = 1.0 - 0.01
        x, y = r * math.sin(lon_hit), -r * math.cos(lon_hit)
        state = PacketState(
            t=jnp.full(n, 100.0), x=jnp.full(n, x), y=jnp.full(n, y),
            z=jnp.zeros(n),
            vx=jnp.full(n, -math.sin(lon_hit) * 1e-3),
            vy=jnp.full(n, math.cos(lon_hit) * 1e-3), vz=jnp.zeros(n),
            frac=jnp.ones(n), lossfrac=jnp.zeros(n))
        out = bounce_packets(KEY, state, jnp.ones(n, bool), spec, table,
                             jnp.asarray(GM), RADIUS_KM)
        return float(np.asarray(out.frac).mean())

    assert np.isclose(frac_at(0.1), 1 - 0.8, atol=1e-6)     # subsolar
    assert np.isclose(frac_at(np.pi), 1 - 0.1, atol=1e-6)   # midnight


def test_stick_map_planet_fixed_rotation():
    """A planet-fixed map rotates by the subsolar longitude: the sticky
    patch at map-longitude L is hit at solar-fixed (subsolarlon - L)."""
    lon = np.linspace(0, 2 * np.pi, 361)
    lat = np.linspace(-np.pi / 2, np.pi / 2, 181)
    L = 1.0                                   # sticky patch center (map frame)
    smap = np.exp(-((lon[:, None] - L) / 0.1) ** 2) * np.ones((1, lat.size))
    subsolarlon = 2.5
    table = _map_table(smap, lon, lat, subsolarlon=subsolarlon)
    spec = EngineSpec(surface_bounce=True, accom=False,
                      sticktype='surface map', stick_map_planet_fixed=True)

    def stick_at(lon_hit):
        n = 10
        r = 1.0 - 0.001
        x, y = r * math.sin(lon_hit), -r * math.cos(lon_hit)
        state = PacketState(
            t=jnp.full(n, 100.0), x=jnp.full(n, x), y=jnp.full(n, y),
            z=jnp.zeros(n),
            vx=jnp.full(n, -math.sin(lon_hit) * 1e-3),
            vy=jnp.full(n, math.cos(lon_hit) * 1e-3), vz=jnp.zeros(n),
            frac=jnp.ones(n), lossfrac=jnp.zeros(n))
        out = bounce_packets(KEY, state, jnp.ones(n, bool), spec, table,
                             jnp.asarray(GM), RADIUS_KM)
        return 1.0 - float(np.asarray(out.frac).mean())

    assert stick_at((subsolarlon - L) % (2 * np.pi)) > 0.95
    assert stick_at((subsolarlon - L + np.pi) % (2 * np.pi)) < 0.01


def test_output_surface_map_sticking_end_to_end(tmp_path):
    """Output runs a surface-map sticking config from an on-disk pkl map —
    the configuration the reference's engine asserts on."""
    import os
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    from nexoclom_tpu.particle_tracking import Output
    lon = np.linspace(0, 2 * np.pi, 73)
    lat = np.linspace(-np.pi / 2, np.pi / 2, 37)
    mapfile = tmp_path / 'stickmap.pkl'
    with open(mapfile, 'wb') as f:
        pickle.dump({'abundance': np.full((73, 37), 0.4),
                     'longitude': lon, 'latitude': lat,
                     'coordinate_system': 'solar-fixed'}, f)
    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(inputfiles, 'mercury_na_spot.input'))
    inp.options.endtime = 1200.0
    inp.options.lifetime = 1e30      # no photo loss: frac is purely sticking
    inp.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'surface map', 'stick_mapfile': str(mapfile),
         'accomfactor': '0.5'})
    out = Output(inp, 200, seed=21)
    fracs = out.X.frac.to_numpy()
    assert np.all((fracs >= 0) & (fracs <= 1.0 + 1e-9))
    # bounced packets carry frac = (1 - 0.4)^k exactly
    bounced = fracs[(fracs > 0.1) & (fracs < 0.95)]
    assert bounced.size > 0
    k = np.log(bounced) / np.log(0.6)
    assert np.allclose(k, np.round(k), atol=1e-3)


def test_stick_mapfile_missing_raises():
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    from nexoclom_tpu.particle_tracking import Output
    from nexoclom_tpu.utilities.exceptions import InputError
    inputfiles = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(inputfiles, 'mercury_gravity.input'))
    inp.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'surface map', 'accomfactor': '0.5'})
    with pytest.raises(InputError):
        Output(inp, 10)


def test_sticking_map_wraps_longitude_seam():
    """A bin-center grid over [0, 2pi - dlon] gets a periodic wrap row:
    impacts just below 2pi interpolate between the last column and
    column 0 instead of flat-clamping."""
    from nexoclom_tpu.ops.surface import bilinear_lookup, build_sticking_map
    nlon, nlat = 36, 7
    dlon = 2 * np.pi / nlon
    lon = np.arange(nlon) * dlon            # stops one spacing short
    lat = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    smap = np.linspace(0.0, 1.0, nlon)[:, None] * np.ones((1, nlat))

    class _Map:
        pass
    m = _Map()
    m.abundance, m.longitude, m.latitude = smap, lon, lat
    table, lon0, dl, lat0, dla = build_sticking_map(m)
    assert table.shape[0] == nlon + 1       # wrap row appended
    np.testing.assert_allclose(table[-1], table[0])
    # halfway across the seam: mean of last and first values
    probe_lon = lon[-1] + dlon / 2
    row = jnp.asarray([(probe_lon - lon0) / dl])
    col = jnp.asarray([(0.0 - lat0) / dla])
    got = float(bilinear_lookup(jnp.asarray(table), row, col)[0])
    want = 0.5 * (smap[-1, 0] + smap[0, 0])
    assert got == pytest.approx(want, rel=1e-9)
