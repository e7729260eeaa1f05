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
