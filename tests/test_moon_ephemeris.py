"""Vendored moon mean ephemeris (quirk F24): internal consistency of the
epoch constants, agreement with observed lunar syzygies, and the
geometry.starttime satellite path end to end."""
import math

import numpy as np
import pytest

from nexoclom_tpu.solarsystem.moon_ephemeris import (
    MOON_EPHEMERIDES, moon_phase_at_time)
from nexoclom_tpu.solarsystem.ssobject import SSObject

pytestmark = pytest.mark.solarsystem

TWO_PI = 2.0 * math.pi


def test_laplace_resonance_epoch_and_rate():
    """The Galilean epoch phases must satisfy the Laplace relation
    u1 - 3 u2 + 2 u3 = 180 deg, and the rates its frozen derivative —
    an independent check that the vendored constants are real ephemeris
    values, not typos."""
    u1, n1 = MOON_EPHEMERIDES['Io']
    u2, n2 = MOON_EPHEMERIDES['Europa']
    u3, n3 = MOON_EPHEMERIDES['Ganymede']
    assert (u1 - 3 * u2 + 2 * u3) % 360.0 == pytest.approx(180.0, abs=1e-3)
    assert n1 - 3 * n2 + 2 * n3 == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize('name', ['Io', 'Europa', 'Ganymede', 'Callisto'])
def test_rates_match_constants_table(name):
    """Each tabulated rate equals n_moon - n_planet from the vendored
    planetary-constants table (to the table's 3-decimal period rounding)."""
    moon, jup = SSObject(name), SSObject('Jupiter')
    n_rel = 360.0 / moon.orbperiod - 360.0 / jup.orbperiod
    assert MOON_EPHEMERIDES[name][1] == pytest.approx(n_rel, rel=2e-4)


def test_lunar_phase_against_observed_syzygies():
    """phi(Moon) = pi at new moon, 0 at full moon, for four observed
    events spanning 25 years (incl. the 2024-04-08 total solar eclipse
    and the 2000-01-21 / 2025-09-07 total lunar eclipses)."""
    events = [('2000-01-06T18:14:00', math.pi),
              ('2000-01-21T04:44:00', 0.0),
              ('2024-04-08T18:21:00', math.pi),
              ('2025-09-07T18:12:00', 0.0)]
    for time, expect in events:
        phi = moon_phase_at_time(time, 'Earth', 'Moon')
        err = abs((phi - expect + math.pi) % TWO_PI - math.pi)
        assert err < math.radians(0.5), (time, math.degrees(phi))


def test_phase_advances_at_synodic_rate():
    """Over one synodic period phi returns to itself (mod the planet's
    equation-of-center drift, < 0.06 deg/period for Jupiter)."""
    u0, udot = MOON_EPHEMERIDES['Io']
    from datetime import datetime, timedelta, timezone
    t0 = datetime(2026, 8, 16, tzinfo=timezone.utc)
    t1 = t0 + timedelta(days=360.0 / udot)
    # geometric phases: the apparent correction drifts with the changing
    # Earth-Jupiter distance and is tested separately
    p0 = moon_phase_at_time(t0, 'Jupiter', 'Io', apparent=False)
    p1 = moon_phase_at_time(t1, 'Jupiter', 'Io', apparent=False)
    assert abs((p1 - p0 + math.pi) % TWO_PI - math.pi) < math.radians(0.1)


def test_light_time_correction():
    """apparent=True (the default, matching the reference's SPICE
    abcorr='LT') retards the configuration by the Earth-planet light
    travel time: for Io that is 5-7 deg of orbital phase; for Earth's own
    Moon it is ~0."""
    from nexoclom_tpu.solarsystem.planet_geometry import earth_distance_au
    t = '2026-08-16T00:00:00'
    dist = earth_distance_au(t, 'Jupiter')
    assert 3.9 < dist < 6.5                      # sanity: AU range
    delay_days = dist * 499.004784 / 86400.0
    geo = moon_phase_at_time(t, 'Jupiter', 'Io', apparent=False)
    app = moon_phase_at_time(t, 'Jupiter', 'Io')
    udot = math.radians(MOON_EPHEMERIDES['Io'][1])
    expect = udot * delay_days
    assert abs((geo - app + math.pi) % TWO_PI - math.pi
               ) == pytest.approx(expect, rel=1e-2)
    # Earth's Moon viewed from Earth: no correction
    geo_m = moon_phase_at_time('2024-04-08T18:21:00', 'Earth', 'Moon',
                               apparent=False)
    app_m = moon_phase_at_time('2024-04-08T18:21:00', 'Earth', 'Moon')
    assert abs(geo_m - app_m) < 1e-9


def test_untabulated_moon_names_fallback():
    with pytest.raises(NotImplementedError, match='geometry.phi'):
        moon_phase_at_time('2026-01-01T00:00:00', 'Saturn', 'Titan')


def test_starttime_fixture_launches_from_ephemeris_phase():
    """The jupiter_io_starttime fixture runs: packets launch from Io's
    ephemeris position at the start timestamp."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.satellites import satellite_start
    inp = Input(os.path.join(os.path.dirname(__file__), 'data',
                             'inputfiles', 'jupiter_io_starttime.input'))
    phi = moon_phase_at_time(inp.geometry.time, 'Jupiter', 'Io')
    center, v_orb, scale = satellite_start(inp.geometry)
    a_io = SSObject('Io').a / SSObject('Jupiter').radius
    # orbit_state convention: x = -a sin(phi), y = a cos(phi) (+y = anti-solar)
    assert np.hypot(center[0], center[1]) == pytest.approx(a_io, rel=1e-6)
    assert math.atan2(-center[0], center[1]) % TWO_PI == pytest.approx(phi)
    # orbital speed ~ 17.3 km/s in R_J/s
    v_kms = float(np.linalg.norm(v_orb)) * SSObject('Jupiter').radius
    assert v_kms == pytest.approx(17.3, rel=0.01)


@pytest.mark.parametrize('name', sorted(
    __import__('nexoclom_tpu.solarsystem.moon_ephemeris',
               fromlist=['MOON_MEAN_MOTIONS']).MOON_MEAN_MOTIONS))
def test_mean_motions_match_constants_table(name):
    """The vendored sidereal mean motions reproduce the constants table's
    orbital periods to its rounding — the same internal cross-check the
    Galilean rates get."""
    from nexoclom_tpu.solarsystem.moon_ephemeris import MOON_MEAN_MOTIONS
    assert 360.0 / MOON_MEAN_MOTIONS[name] == pytest.approx(
        SSObject(name).orbperiod, rel=5e-3)


def test_register_moon_ephemeris(monkeypatch):
    """One observed phase registers a full mean ephemeris: exact at the
    epoch by construction, advancing at (n_moon - n_planet) afterwards.
    There is no validation anchor for Saturn-moon epoch phases inside
    this image, so the phase is user-supplied — this tests the machinery,
    not a vendored constant."""
    import nexoclom_tpu.solarsystem.moon_ephemeris as me
    from datetime import datetime, timedelta, timezone
    monkeypatch.setattr(me, 'MOON_EPHEMERIDES', dict(me.MOON_EPHEMERIDES))

    epoch = datetime(2026, 8, 17, tzinfo=timezone.utc)
    phi0 = 1.2345
    me.register_moon_ephemeris('Enceladus', phi0, epoch)
    assert me.moon_phase_at_time(epoch, 'Saturn', 'Enceladus') == \
        pytest.approx(phi0, abs=1e-9)
    # rate: over 0.5 day the phase advances by udot/2 (the light-time and
    # equation-of-center drifts over half a day are < 1e-3 deg)
    udot = me.MOON_EPHEMERIDES['Enceladus'][1]
    assert udot == pytest.approx(
        me.MOON_MEAN_MOTIONS['Enceladus'] -
        360.0 / SSObject('Saturn').orbperiod)
    # geometric phases isolate the mean motion (the apparent correction
    # drifts with the changing Earth-Saturn distance, ~0.01 deg/half-day)
    p0 = me.moon_phase_at_time(epoch, 'Saturn', 'Enceladus',
                               apparent=False)
    p1 = me.moon_phase_at_time(epoch + timedelta(days=0.5), 'Saturn',
                               'Enceladus', apparent=False)
    adv = (p1 - p0) % TWO_PI
    assert adv == pytest.approx(math.radians(udot * 0.5) % TWO_PI,
                                abs=math.radians(2e-3))
    # Titan: same machinery, ~22.54 deg/day relative rate
    me.register_moon_ephemeris('Titan', 0.5, epoch)
    assert me.MOON_EPHEMERIDES['Titan'][1] == pytest.approx(22.543, abs=2e-3)
    # moons without a tabulated rate need an explicit one
    with pytest.raises(NotImplementedError, match='udot_deg_per_day'):
        me.register_moon_ephemeris('Hyperion', 0.0, epoch)
    me.register_moon_ephemeris('Hyperion', 0.0, epoch,
                               udot_deg_per_day=16.88)
    assert 'Hyperion' in me.MOON_EPHEMERIDES


def test_registered_moon_drives_starttime_geometry(monkeypatch, tmp_path):
    """geometry.starttime works end to end for a REGISTERED moon: an
    Enceladus satellite input launches packets from the registered
    ephemeris phase (same chain the built-in Io fixture tests)."""
    import os
    import nexoclom_tpu.solarsystem.moon_ephemeris as me
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.satellites import satellite_start
    monkeypatch.setattr(me, 'MOON_EPHEMERIDES', dict(me.MOON_EPHEMERIDES))

    me.register_moon_ephemeris('Enceladus', 2.0, '2026-08-17T00:00:00')
    src = open(os.path.join(os.path.dirname(__file__), 'data', 'inputfiles',
                            'jupiter_io_starttime.input')).read()
    src = (src.replace('Jupiter', 'Saturn').replace('Io', 'Enceladus')
           .replace('2022-03-08T19:53:21', '2026-08-17T12:00:00'))
    infile = tmp_path / 'saturn_enceladus_starttime.input'
    infile.write_text(src)
    inp = Input(str(infile))
    phi = me.moon_phase_at_time(inp.geometry.time, 'Saturn', 'Enceladus')
    center, v_orb, scale = satellite_start(inp.geometry)
    a_enc = SSObject('Enceladus').a / SSObject('Saturn').radius
    assert np.hypot(center[0], center[1]) == pytest.approx(a_enc, rel=1e-6)
    assert math.atan2(-center[0], center[1]) % TWO_PI == pytest.approx(phi)
    # Enceladus orbital speed ~ 12.6 km/s
    v_kms = float(np.linalg.norm(v_orb)) * SSObject('Saturn').radius
    assert v_kms == pytest.approx(12.6, rel=0.02)
