"""Planet geometry from a timestamp.

The reference's time-based geometry path depends on SPICE kernels and is
effectively dead code (``solarsystem/planet_geometry.py`` requires
``spiceypy`` with a hard-coded kernel path; ``spice_routines.py`` does not
even parse — SURVEY.md section 2.4).  This build provides a self-contained
Kepler propagation from standard J2000 mean orbital elements instead:
``planet_geometry(time, planet)`` returns the heliocentric distance, radial
velocity, and true anomaly, which is everything the engine consumes
(``Output.py:108-110``).

Mean elements (a from the vendored constants table; L0 and the longitude of
perihelion at epoch J2000.0 from the standard Keplerian-element fits used for
ephemeris approximation).  Accuracy is tens of arcminutes in TAA over
centuries — ample for exosphere geometry (the TAA match window is 0.5 deg).
"""
from __future__ import annotations

import math
from datetime import datetime, timezone

from nexoclom_tpu.solarsystem.kepler import planet_dist, true_anomaly_from_mean
from nexoclom_tpu.solarsystem.ssobject import SSObject

# J2000.0 mean longitude L0 and longitude of perihelion (degrees)
_J2000_ELEMENTS = {
    'Mercury': (252.25084, 77.45645),
    'Venus': (181.97973, 131.53298),
    'Earth': (100.46435, 102.94719),
    'Mars': (355.45332, 336.04084),
    'Jupiter': (34.40438, 14.75385),
    'Saturn': (49.94432, 92.43194),
    'Uranus': (313.23218, 170.96424),
    'Neptune': (304.88003, 44.97135),
}

_J2000 = datetime(2000, 1, 1, 11, 58, 56, tzinfo=timezone.utc)


def parse_time(time) -> datetime:
    if isinstance(time, datetime):
        return time if time.tzinfo else time.replace(tzinfo=timezone.utc)
    if isinstance(time, str):
        parsed = datetime.fromisoformat(time)
        return parsed if parsed.tzinfo else parsed.replace(tzinfo=timezone.utc)
    raise TypeError('time must be a datetime or ISO-format string')


def days_since_j2000(time) -> float:
    """Days elapsed since the J2000.0 epoch (UTC assumed when naive)."""
    return (parse_time(time) - _J2000).total_seconds() / 86400.0


def mean_anomaly_at_time(time, planet) -> float:
    """Mean anomaly (radians, [0, 2pi)) of ``planet`` at ``time``."""
    if isinstance(planet, str):
        planet = SSObject(planet)
    if planet.object not in _J2000_ELEMENTS:
        raise NotImplementedError(
            f'mean elements not tabulated for {planet.object}')
    L0, long_peri = _J2000_ELEMENTS[planet.object]

    mean_motion = 360.0 / planet.orbperiod                  # deg/day
    mean_longitude = L0 + mean_motion * days_since_j2000(time)
    return math.radians((mean_longitude - long_peri) % 360.0)


def true_anomaly_at_time(time, planet) -> float:
    """True anomaly (radians) of ``planet`` at ``time``."""
    if isinstance(planet, str):
        planet = SSObject(planet)
    return true_anomaly_from_mean(mean_anomaly_at_time(time, planet),
                                  planet.e)


def heliocentric_state(time, planet):
    """(r_au, ecliptic_longitude_rad) of ``planet`` at ``time`` from the
    mean elements — the pieces needed for Earth-planet distances."""
    if isinstance(planet, str):
        planet = SSObject(planet)
    if planet.object not in _J2000_ELEMENTS:
        raise NotImplementedError(
            f'mean elements not tabulated for {planet.object}')
    _, long_peri = _J2000_ELEMENTS[planet.object]
    taa = true_anomaly_at_time(time, planet)
    r, _ = planet_dist(planet, taa)
    return r, (taa + math.radians(long_peri)) % (2.0 * math.pi)


def earth_distance_au(time, planet) -> float:
    """Earth-planet distance (AU) at ``time`` from the mean elements
    (coplanar approximation; good to ~1% — used for light-time)."""
    if isinstance(planet, str):
        planet = SSObject(planet)
    if planet.object == 'Earth':
        return 0.0
    r_e, lon_e = heliocentric_state(time, 'Earth')
    r_p, lon_p = heliocentric_state(time, planet)
    return math.sqrt(r_e * r_e + r_p * r_p
                     - 2.0 * r_e * r_p * math.cos(lon_e - lon_p))


def planet_geometry(time, planet):
    """(r_au, v_r_kms, taa_rad) at ``time`` (reference
    ``planet_geometry()`` returned the same triple from SPICE state
    vectors)."""
    if isinstance(planet, str):
        planet = SSObject(planet)
    taa = true_anomaly_at_time(time, planet)
    r, v_r = planet_dist(planet, taa)
    return r, v_r, taa
