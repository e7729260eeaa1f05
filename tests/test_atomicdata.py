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


def test_gvalue_killen2022_dataset():
    """The selectable Killen 2022 dataset (vendored from the CSVs the
    reference ships but never loads, data/g-values/Na.Killen2022.csv):
    Na D2 at the 0.352 AU refpoint must equal the source rows exactly,
    and the 1/r^2 scaling applies like the 2009 set."""
    g22 = gValue('Na', 5891, 0.352, version='Killen2022')
    assert g22.reference == 'Killen et al. (2022)'
    assert len(g22.velocity) == 1001           # the 2022 grids are 1001-row
    # source-row anchors straight from Na.Killen2022.csv
    assert np.interp(-50.0, g22.velocity, g22.g) == pytest.approx(82.74946)
    assert np.interp(50.0, g22.velocity, g22.g) == pytest.approx(82.64445)
    g22_1au = gValue('Na', 5891, 1.0, version='Killen2022')
    assert np.allclose(g22_1au.g, g22.g * 0.352 ** 2)
    # distinct from the default 2009 dataset at the same point
    g09 = gValue('Na', 5891, 0.352)
    assert abs(np.interp(-50.0, g09.velocity, g09.g) - 82.74946) > 1.0
    # case-insensitive selection, canonicalized
    assert gValue('Na', 5891, 0.352, version='killen2022').version == \
        'Killen2022'


def test_gvalue_killen2022_strict_selection():
    """Dataset selection is strict: lines absent from the 2022 set are not
    backfilled from 2009 (Na 3303 exists only in 2009), and unknown
    versions are rejected with the available choices named."""
    g = gValue('Na', 3303, 0.352, version='Killen2022')
    assert np.all(g.g == 0)                    # warning path, no backfill
    rp22 = RadPresConst('Na', 0.352, version='Killen2022')
    assert list(rp22.wavelength) == [5891.0, 5897.0]
    rp09 = RadPresConst('Na', 0.352)
    assert 3303.0 in rp09.wavelength
    assert rp22.accel.max() != pytest.approx(rp09.accel.max(), rel=1e-3)
    with pytest.raises(ValueError, match='Killen2009, Killen2022'):
        radpres_table('Na', 0.352, version='Killen1999')


def test_gvalue_version_input_grammar(tmp_path):
    """options.gvalue_version flows from the input file into the force
    table and radiance weighting; the default stays out of the canonical
    dict (catalog compatibility with pre-extension runs)."""
    from nexoclom_tpu.initial_state.sections import Options
    from nexoclom_tpu.utilities.exceptions import InputError
    base = {'endtime': '3600', 'species': 'Na'}
    opt = Options({**base, 'gvalue_version': 'killen2022'})
    assert opt.gvalue_version == 'Killen2022'
    assert Options.from_dict(opt.to_dict()) == opt
    # explicit default and absent both leave the dict unmarked
    assert 'gvalue_version' not in Options(
        {**base, 'gvalue_version': 'Killen2009'}).to_dict()
    assert 'gvalue_version' not in Options(base).to_dict()
    with pytest.raises(InputError):
        Options({**base, 'gvalue_version': 'Killen1999'})


def test_gvalue_version_reaches_force_table():
    """A Killen2022 run builds its radiation-pressure table from the 2022
    dataset (different peak acceleration than the 2009 default)."""
    import jax.numpy as jnp
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.output import build_force_table
    import os as _os
    infile = _os.path.join(_os.path.dirname(__file__), 'data', 'inputfiles',
                           'mercury_na_spot.input')
    inp09 = Input(infile)
    inp22 = Input(infile)
    inp22.options.gvalue_version = 'Killen2022'
    radius_km = inp09.geometry.planet.radius
    f09 = build_force_table(inp09, 0.352, 0.0, radius_km, jnp.float64)
    f22 = build_force_table(inp22, 0.352, 0.0, radius_km, jnp.float64)
    a09 = float(np.max(np.asarray(f09.rp_accel)))
    a22 = float(np.max(np.asarray(f22.rp_accel)))
    assert a22 != pytest.approx(a09, rel=1e-3)
    # both near the known Na peak at 0.352 AU (~3.6-3.7 m/s^2)
    for a in (a09, a22):
        assert 2e-3 / radius_km < a < 5e-3 / radius_km
