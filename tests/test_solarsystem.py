"""Solar-system layer tests (constants and Kepler geometry)."""
import numpy as np
import pytest

from nexoclom_tpu.constants import ASTRONOMICAL_UNIT_KM, SECONDS_PER_DAY
from nexoclom_tpu.solarsystem import SSObject, planet_dist

pytestmark = pytest.mark.solarsystem


def test_ssobject_mercury():
    mercury = SSObject('Mercury')
    assert mercury.object == 'Mercury'
    assert mercury.type == 'Planet'
    assert np.isclose(mercury.radius, 2440.53)
    assert np.isclose(mercury.e, 0.20563)
    assert mercury.GM < 0  # reference sign convention
    assert np.isclose(-mercury.GM, 6.6743e-11 * 3.30103e23)
    assert mercury.moons is None


def test_ssobject_earth_moon():
    earth = SSObject('earth')  # case-insensitive
    assert earth.moons is not None
    assert any(m.object == 'Moon' for m in earth.moons)
    assert len(earth) == 2


def test_ssobject_unknown():
    assert SSObject('Vulcan').object is None


def test_gm_model_units():
    mercury = SSObject('Mercury')
    # GM in R_p^3/s^2: -G*M / R^3
    expected = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3
    assert np.isclose(mercury.gm_rp3, expected, rtol=1e-6)


def test_planet_dist_perihelion_aphelion():
    mercury = SSObject('Mercury')
    r_peri, vr_peri = planet_dist(mercury, 0.0)
    r_apo, vr_apo = planet_dist(mercury, np.pi)
    assert np.isclose(r_peri, mercury.a * (1 - mercury.e))
    assert np.isclose(r_apo, mercury.a * (1 + mercury.e))
    assert abs(vr_peri) < 1e-12 and abs(vr_apo) < 1e-10
    # outbound leg has positive radial velocity
    _, vr_mid = planet_dist(mercury, np.pi / 2)
    assert vr_mid > 0


def test_planet_dist_matches_reference_series():
    """The reference computes v_r via a 3rd-order equation-of-center series
    plus numeric differencing (``planet_dist.py:54-67``).  Our exact two-body
    expression must agree within 1% of v_max for Mercury."""
    mercury = SSObject('Mercury')
    a, eps = mercury.a, mercury.e
    period = mercury.orbperiod * SECONDS_PER_DAY

    time = np.linspace(0, 1, 1000) * period
    time = np.concatenate([[time[0] - time[1]], time])
    mean_anomaly = np.linspace(0, 2 * np.pi, 1000)
    mean_anomaly = np.concatenate(
        [[mean_anomaly[0] - mean_anomaly[1]], mean_anomaly])
    true_anomaly = (mean_anomaly +
                    (2 * eps - eps ** 3 / 4) * np.sin(mean_anomaly) +
                    5 / 4 * eps ** 2 * np.sin(2 * mean_anomaly) +
                    13 / 12 * eps ** 3 * np.sin(3 * mean_anomaly))
    r_true = a * (1 - eps ** 2) / (1 + eps * np.cos(true_anomaly))
    drdt = (np.diff(r_true) / np.diff(time)) * ASTRONOMICAL_UNIT_KM  # km/s

    vmax = np.abs(drdt).max()
    for taa in (0.5, 1.3, 2.0, 3.0, 4.5, 5.5):
        _, vr = planet_dist(mercury, taa)
        vr_ref = np.interp(taa, true_anomaly[1:], drdt)
        assert abs(vr - vr_ref) < 0.01 * vmax


def test_planet_dist_circular():
    # zero-eccentricity body: r = a, v_r = 0
    sun = SSObject('Sun')
    assert planet_dist(sun, 1.0) == (sun.a, 0.0)


def test_planet_dist_by_name_and_typeerror():
    r, vr = planet_dist('Mercury', 0.0)
    assert r > 0
    with pytest.raises(TypeError):
        planet_dist(42, 0.0)
