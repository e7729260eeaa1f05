"""Keplerian heliocentric distance and radial velocity.

``planet_dist(planet, taa)`` returns ``(r_au, v_r_kms)`` for a planet at true
anomaly ``taa`` (radians): the distance from the Sun and the radial velocity
relative to the Sun (positive = moving away).

Parity note: the reference (``solarsystem/planet_dist.py:36-69``) evaluates
dr/dt by building a 1000-point equation-of-center series expansion (3rd order
in eccentricity) and numerically differencing r(t).  This build uses the exact
two-body expression instead,

    r   = a (1 - e^2) / (1 + e cos nu)
    v_r = (2 pi a / T) * e sin(nu) / sqrt(1 - e^2),

which agrees with the reference's approximation to better than 0.5% for
Mercury (e = 0.2056) and is exact for all eccentricities; the deviation is
documented in docs/QUIRKS.md and verified in tests/test_solarsystem.py.
"""
from __future__ import annotations

import math

from nexoclom_tpu.constants import ASTRONOMICAL_UNIT_KM, SECONDS_PER_DAY
from nexoclom_tpu.solarsystem.ssobject import SSObject


def planet_dist(planet, taa: float):
    """Heliocentric distance (AU) and radial velocity (km/s) at true anomaly.

    Parameters
    ----------
    planet : SSObject or str
    taa : true anomaly angle in radians
    """
    if isinstance(planet, str):
        planet = SSObject(planet)
        if planet.object is None:
            return None
    elif not isinstance(planet, SSObject):
        raise TypeError('planet_dist requires an SSObject or object name')

    a, e = planet.a, planet.e
    if e <= 0:
        return a, 0.0

    r = a * (1.0 - e * e) / (1.0 + e * math.cos(taa))

    period_s = planet.orbperiod * SECONDS_PER_DAY
    a_km = a * ASTRONOMICAL_UNIT_KM
    v_r = (2.0 * math.pi * a_km / period_s) * e * math.sin(taa) / \
        math.sqrt(1.0 - e * e)
    return r, v_r


def true_anomaly_from_mean(mean_anomaly: float, e: float,
                           tol: float = 1e-12) -> float:
    """Solve Kepler's equation M = E - e sin E and convert to true anomaly."""
    ecc_anom = mean_anomaly if e < 0.8 else math.pi
    for _ in range(64):
        delta = (ecc_anom - e * math.sin(ecc_anom) - mean_anomaly) / \
            (1.0 - e * math.cos(ecc_anom))
        ecc_anom -= delta
        if abs(delta) < tol:
            break
    nu = 2.0 * math.atan2(math.sqrt(1 + e) * math.sin(ecc_anom / 2),
                          math.sqrt(1 - e) * math.cos(ecc_anom / 2))
    return nu % (2.0 * math.pi)
