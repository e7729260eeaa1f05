"""Atomic-data layer tests.

Golden values follow the reference's documented behaviour:
* ``PhotoRate('Na', 0.33).rate`` == 7.26e-6 / 0.33^2 == 6.6667e-5 /s
  (docstring example in ``nexoclom/atomicdata/photolossrates.py:40-47``)
* g-values scale as refpoint^2 / aplanet^2 (``g_values.py:86-87``)
"""
import numpy as np
import pytest

from nexoclom_tpu.atomicdata import (atomicmass, gValue, PhotoRate,
                                     RadPresConst, radpres_table)

pytestmark = pytest.mark.atomicdata


def test_atomicmass_elements():
    assert abs(atomicmass('Na') - 22.98976928) < 1e-6
    assert abs(atomicmass('Ca') - 40.078) < 1e-6
    assert abs(atomicmass('H_2O') - 18.015) < 1e-2
    assert abs(atomicmass('CH_4') - 16.043) < 1e-2
    # ions: electron mass neglected
    assert abs(atomicmass('Mg+') - 24.305) < 1e-6
    # grouped formula Ca(OH)2
    expected = 40.078 + 2 * (15.999 + 1.008)
    assert abs(atomicmass('Ca=OH=_2') - expected) < 1e-2


def test_atomicmass_unknown():
    assert atomicmass('Xx') is None


def test_photorate_na():
    rate = PhotoRate('Na', 0.33)
    assert np.isclose(rate.rate, 7.26e-6 / 0.33 ** 2, rtol=1e-6)


def test_photorate_h2o_at_1au():
    # Huebner & Mukherjee 2011 sum over the 7 H_2O branches (reference
    # docstring example: 1.2056e-5 /s at 1 AU)
    rate = PhotoRate('H_2O', 1.0)
    assert np.isclose(rate.rate, 1.2056349999999999e-05, rtol=1e-6)


def test_photorate_unknown_floor():
    rate = PhotoRate('Unobtainium')
    assert rate.rate == 1e-30


def test_gvalue_scaling():
    g1 = gValue('Na', 5891, 1.0)
    g2 = gValue('Na', 5891, 0.5)
    assert np.allclose(g2.g, g1.g * 4.0)
    assert np.all(np.diff(g1.velocity) > 0)
    # Killen 2009 Na D2 table: 389 velocity points spanning ~[-49, 50] km/s
    assert len(g1.velocity) == 389
    assert g1.velocity[0] < -49 and g1.velocity[-1] > 49


def test_gvalue_missing_species():
    g = gValue('Unobtainium', 1234, 1.0)
    assert np.all(g.g == 0)


def test_radpres_positive_and_scales():
    rp1 = RadPresConst('Na', 1.0)
    rp2 = RadPresConst('Na', 0.352)
    assert np.all(rp1.accel >= 0)
    assert rp1.accel.max() > 0
    # closer to the Sun -> stronger acceleration
    assert rp2.accel.max() > rp1.accel.max()
    # Na radiation acceleration at ~0.35 AU peaks around 10^-1.7 km/s^2?
    # Sanity bound: between 1e-6 and 1 km/s^2.
    assert 1e-6 < rp2.accel.max() < 1.0


def test_radpres_table_uniform_grid():
    v0, dv, accel = radpres_table('Na', 0.352)
    rp = RadPresConst('Na', 0.352)
    grid = v0 + dv * np.arange(len(accel))
    # grid values are exact samples of the source interpolant
    assert np.allclose(accel, np.interp(grid, rp.velocity, rp.accel))
    # and the regridding resolves the source table well
    back = np.interp(rp.velocity, grid, accel)
    assert np.allclose(back, rp.accel, rtol=2e-2, atol=1e-9)
