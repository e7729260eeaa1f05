"""Moon orbital phases from a timestamp — self-contained mean ephemerides.

The reference's satellite geometry path is dead code twice over: the
engine refuses satellite start points (``Output.py:153-155``) and the
time-based geometry needs SPICE kernels it ships commented out
(``solarsystem/load_kernels.py:27-39`` loads ``jup310.bsp`` from a
hard-coded path).  This build makes ``geometry.starttime`` work for moon
sources with a vendored mean ephemeris instead of kernels.

Model: each tabulated moon moves on its circular, planet-equatorial model
orbit (the same orbit the engine integrates, quirk F16) with its phase
measured from the planet's anti-solar direction — the engine's ``phi``
convention (0 = superior conjunction, pi/2 = dawn terminator, prograde).
Relative to the planet's MEAN anti-solar direction that phase advances
linearly,

    u(t) = u0 + (n_moon - n_planet) * d,      d = days since J2000.0,

and the TRUE anti-solar direction differs from the mean one by the
planet's equation of center, which ``kepler.true_anomaly_from_mean``
evaluates exactly:

    phi(t) = u(t) - (nu_planet(t) - M_planet(t))  [+ lunar inequalities].

Tabulated constants are the classical J2000 low-precision satellite
ephemeris values (the ones behind every "positions of the Galilean
satellites" almanac routine).  They are internally verifiable, and the
tests do verify them: the relative rates equal n_moon - n_planet from the
vendored constants table, and the Galilean epoch phases satisfy the
Laplace resonance u1 - 3 u2 + 2 u3 = 180 deg to 1e-4 deg.  For Earth's
Moon the four largest inequalities in longitude (principal elliptic term,
evection, variation, annual equation) are applied on top of the mean
motion; the tests pin the result against the observed new moon of
2000-01-06 18:14 UTC and the total lunar eclipse of 2000-01-21 04:44 UTC.

Timestamps are treated as EARTH observation times by default
(``apparent=True``): the configuration is evaluated one light-travel time
earlier (Earth-Jupiter is 35-52 min, over which Io moves 5-7 deg),
matching the reference's SPICE ``abcorr='LT'`` convention; pass
``apparent=False`` for the instantaneous geometric phase.

Accuracy: ~0.2 deg for the Moon, ~1 deg for the Galilean moons (their
neglected free eccentricities are < 0.01 and mutual-perturbation terms
< 1 deg) — far inside the geometry tolerance of exosphere modelling (the
catalog's TAA match window alone is 0.5 deg).  Moons without tabulated
elements raise ``NotImplementedError`` with the geometry.phi fallback
spelled out.

Moons beyond the built-in set (Saturn's mid-sized moons and Titan) have
classical, high-confidence mean MOTIONS vendored (``MOON_MEAN_MOTIONS``)
but no J2000 epoch phase: nothing inside this image can validate one (the
Galilean set was pinned by the Laplace resonance, Luna by observed
syzygies), and shipping an unvalidated phase would be silently wrong
science.  Instead :func:`register_moon_ephemeris` builds the ephemeris
from ONE user-observed phase (e.g. a Horizons lookup done elsewhere);
``geometry.starttime`` then works for that moon like any built-in one.
"""
from __future__ import annotations

import math
from datetime import datetime

from nexoclom_tpu.solarsystem.kepler import true_anomaly_from_mean
from nexoclom_tpu.solarsystem.ssobject import SSObject

# moon -> (u0_deg, udot_deg_per_day): phase from the parent planet's MEAN
# anti-solar direction at J2000.0 and its (sidereal moon - planet) rate.
MOON_EPHEMERIDES = {
    'Io':       (163.8069, 203.4058646),
    'Europa':   (358.4140, 101.2916335),
    'Ganymede': (5.7176, 50.2345180),
    'Callisto': (224.8092, 21.4879800),
    # L_moon(J2000) = 218.3164477 minus Earth's L0 = 100.46435;
    # 13.17639648 (sidereal) minus 0.98564736 (Earth).
    'Moon':     (117.8520977, 12.19074912),
}

# Lunar mean anomaly and mean elongation at J2000.0 (deg, deg/day) for the
# longitude inequalities applied to 'Moon' only.
_LUNAR_MP = (134.9633964, 13.06499295)
_LUNAR_D = (297.8501921, 12.19074912)

# Sidereal mean motions (deg/day) for moons whose RATES are classical
# textbook constants but whose J2000 epoch phases have no validation
# anchor available in this image (the Galilean set was pinned by the
# Laplace resonance, Luna by observed syzygies — module docstring).
# 360 / n reproduces the vendored constants table's orbital periods to
# its rounding (tested); the parent's sidereal mean motion is subtracted
# at registration to form the anti-solar-relative rate, matching the
# MOON_EPHEMERIDES convention.  Epoch phases for these moons are
# USER-SUPPLIED via :func:`register_moon_ephemeris`.
MOON_MEAN_MOTIONS = {
    'Mimas':     381.9945,     # 0.942422 d
    'Enceladus': 262.7319,     # 1.370218 d
    'Tethys':    190.6980,     # 1.887802 d
    'Dione':     131.5349,     # 2.736915 d
    'Rhea':      79.6900,      # 4.517500 d
    'Titan':     22.57697,     # 15.945421 d
}

# The parent's sidereal mean motion comes from the vendored constants
# table (360 / orbperiod): its 4-digit rounding shifts the relative rate
# by < 1e-4 deg/day — < 0.04 deg over a decade of extrapolation.


def _planet_equation_of_center(time, planet) -> float:
    """nu - M (radians, wrapped to (-pi, pi]) of the parent planet."""
    from nexoclom_tpu.solarsystem.planet_geometry import mean_anomaly_at_time
    mean_anom = mean_anomaly_at_time(time, planet)   # raises for untabulated
    nu = true_anomaly_from_mean(mean_anom, planet.e)
    return (nu - mean_anom + math.pi) % (2.0 * math.pi) - math.pi


def _lunar_inequalities(time, planet) -> float:
    """Principal elliptic term + evection + variation + annual equation
    for Earth's Moon (radians added to the mean longitude)."""
    from nexoclom_tpu.solarsystem.planet_geometry import (
        days_since_j2000, mean_anomaly_at_time)
    d = days_since_j2000(time)
    mp = math.radians(_LUNAR_MP[0] + _LUNAR_MP[1] * d)    # Moon mean anomaly
    elong = math.radians(_LUNAR_D[0] + _LUNAR_D[1] * d)   # mean elongation
    m_sun = mean_anomaly_at_time(time, planet)            # Earth/Sun anomaly
    deg = (6.289 * math.sin(mp)
           + 1.274 * math.sin(2.0 * elong - mp)
           + 0.658 * math.sin(2.0 * elong)
           - 0.186 * math.sin(m_sun))
    return math.radians(deg)


LIGHT_SECONDS_PER_AU = 499.004784


def register_moon_ephemeris(moon_name: str, phi_at_epoch: float, epoch,
                            planet=None, udot_deg_per_day: float = None,
                            apparent: bool = True) -> None:
    """Register a mean ephemeris for a moon from ONE observed phase.

    No validation anchor for the J2000 epoch phases of moons beyond the
    Galileans + Luna is available inside this image (module docstring), so
    their phases are user-supplied: give the engine-convention phase
    ``phi_at_epoch`` (radians, 0 = superior conjunction/anti-solar,
    pi/2 = dawn, prograde — e.g. read off a Horizons query run elsewhere)
    at ``epoch`` (datetime or ISO string, an Earth observation timestamp
    when ``apparent=True``, matching :func:`moon_phase_at_time`).

    The rate comes from the vendored sidereal mean motions
    (``MOON_MEAN_MOTIONS`` — classical constants, cross-checked against
    the constants table's periods) minus the parent planet's, or from an
    explicit ``udot_deg_per_day``.  Afterwards ``geometry.starttime``
    works for the moon exactly like the built-in set:
    ``moon_phase_at_time(t) == phi_at_epoch`` at the epoch (exact, by
    construction) and advances at the registered rate corrected by the
    planet's equation of center.
    """
    name = moon_name.title()
    if planet is None:
        planet = SSObject(SSObject(name).orbits)
    elif isinstance(planet, str):
        planet = SSObject(planet)
    if udot_deg_per_day is None:
        if name not in MOON_MEAN_MOTIONS:
            raise NotImplementedError(
                f'no mean motion tabulated for {moon_name}; pass '
                f'udot_deg_per_day explicitly (tabulated: '
                f'{", ".join(sorted(MOON_MEAN_MOTIONS))})')
        udot = MOON_MEAN_MOTIONS[name] - 360.0 / planet.orbperiod
    else:
        udot = float(udot_deg_per_day)

    # solve the (linear-in-u0) epoch phase: with u0 = 0 the model returns
    # phase0; the registered u0 is the offset that makes the model return
    # phi_at_epoch exactly at the epoch
    MOON_EPHEMERIDES[name] = (0.0, udot)
    try:
        phase0 = moon_phase_at_time(epoch, planet, name, apparent=apparent)
    except Exception:
        del MOON_EPHEMERIDES[name]
        raise
    u0 = math.degrees((float(phi_at_epoch) - phase0) % (2.0 * math.pi))
    MOON_EPHEMERIDES[name] = (u0, udot)


def moon_phase_at_time(time, planet, moon_name: str,
                       apparent: bool = True) -> float:
    """Orbital phase ``phi`` (radians, [0, 2pi)) of ``moon_name`` at
    ``time`` in the engine's convention: measured from the planet's true
    anti-solar direction, increasing prograde (inputfiles.rst:72-77).

    ``time`` is a datetime or ISO string (UTC assumed when naive);
    ``planet`` is the parent SSObject or its name.

    ``apparent=True`` (default) interprets ``time`` as an EARTH
    observation timestamp and evaluates the configuration one light-travel
    time earlier (Earth-Jupiter is 35-52 min, over which Io moves 5-7
    deg) — matching the reference's SPICE convention (``abcorr='LT'``
    throughout ``spice_routines.py``).  ``apparent=False`` gives the
    instantaneous geometric phase.
    """
    from nexoclom_tpu.solarsystem.planet_geometry import (
        days_since_j2000, earth_distance_au)
    if isinstance(planet, str):
        planet = SSObject(planet)
    name = moon_name.title()
    if name not in MOON_EPHEMERIDES:
        raise NotImplementedError(
            f'no mean ephemeris tabulated for {moon_name}; give the phase '
            f'explicitly with geometry.phi instead of geometry.starttime, '
            f'or supply one observed phase via register_moon_ephemeris '
            f'(tabulated: {", ".join(sorted(MOON_EPHEMERIDES))}; rates '
            f'ready for: {", ".join(sorted(MOON_MEAN_MOTIONS))})')
    days = days_since_j2000(time)
    if apparent:
        delay_s = earth_distance_au(time, planet) * LIGHT_SECONDS_PER_AU
        days -= delay_s / 86400.0
        from datetime import timedelta
        from nexoclom_tpu.solarsystem.planet_geometry import parse_time
        time = parse_time(time) - timedelta(seconds=delay_s)
    u0, udot = MOON_EPHEMERIDES[name]
    phi = math.radians(u0 + udot * days)
    phi -= _planet_equation_of_center(time, planet)
    if name == 'Moon':
        phi += _lunar_inequalities(time, planet)
    return phi % (2.0 * math.pi)
