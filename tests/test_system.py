"""System run-through: the reference's end-to-end scenario
(tests/system_tests/test_run_through.py — MESSENGER orbit data modeled for
Ca and Na) recreated with synthetic spacecraft observations and the
scdata.model() convenience chain."""
import math
import os

import numpy as np
import pandas as pd
import pytest

from nexoclom_tpu.data_simulation import SpacecraftData
from nexoclom_tpu.initial_state import Input

pytestmark = pytest.mark.integration

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _orbit_data(n=20, radius=6.0):
    """A synthetic orbit: spacecraft circling in the x-z plane, boresights
    through the near-planet region."""
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    sc = np.stack([radius * np.cos(theta), np.full(n, -1.5),
                   radius * np.sin(theta)], axis=1)
    target = np.zeros((n, 3))
    target[:, 0] = 1.5 * np.cos(theta + 0.8)
    target[:, 2] = 1.5 * np.sin(theta + 0.8)
    bore = target - sc
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    return pd.DataFrame({
        'x': sc[:, 0], 'y': sc[:, 1], 'z': sc[:, 2],
        'xbore': bore[:, 0], 'ybore': bore[:, 1], 'zbore': bore[:, 2],
        'radiance': np.ones(n), 'sigma': np.full(n, 0.1),
        'alttan': np.abs(sc[:, 2]),
    })


@pytest.mark.parametrize('case', ['mercury_ca_spot.input', 'mercury_na_spot.input'])
def test_run_through(case):
    inputs = Input(os.path.join(INPUTFILES, case))
    inputs.options.endtime = 1500.0   # scaled down for CI

    scdata = SpacecraftData(_orbit_data(), species=inputs.options.species,
                            query=f'synthetic orbit {case}')
    result = scdata.model(inputs, 2000, dphi=math.radians(3.0),
                          label=f'system_{case}', seed=1234)

    model = result.radiance.to_numpy()
    assert np.all(np.isfinite(model))
    assert model.max() > 0
    assert result.sourcerate > 0
    assert result.npackets == 2000
    # registered on the scdata for later fitted retrievals
    assert scdata.model_result[f'system_{case}'] is result
    # second call reuses both the packets and the LOS iterations
    result2 = scdata.model(inputs, 2000, dphi=math.radians(3.0),
                           label=f'again_{case}', seed=1234)
    assert np.allclose(result2.radiance.to_numpy(), model, rtol=1e-9)


def test_messenger_like_orbit_physical_radiance():
    """Realistic viewing geometry at scale: the vendored MESSENGER-like
    orbit (eccentric polar orbit, UVVS-style dayside limb scans incl.
    disk-pointing rays; scripts/make_messenger_orbit.py) produces model
    radiance that is finite, positive near the limb, and falls with
    tangent altitude — the physical signature of an exospheric limb scan."""
    orbit = pd.read_csv(os.path.join(os.path.dirname(__file__), 'data',
                                     'orbits', 'messenger_like_orbit.csv'))
    assert len(orbit) == 96
    inputs = Input(os.path.join(INPUTFILES, 'mercury_na_spot.input'))
    inputs.options.endtime = 3000.0
    scdata = SpacecraftData(orbit, species='Na',
                            query='messenger-like orbit fixture')
    result = scdata.model(inputs, 20000, dphi=math.radians(1.0),
                          label='messenger_like', seed=77)
    model = result.radiance.to_numpy()
    assert np.all(np.isfinite(model))

    # limb spectra see signal; radiance decays with tangent altitude
    alt = orbit.alttan.to_numpy()
    low = (alt > 0) & (alt < 400)
    high = alt > 1500
    assert model[low].mean() > 0
    assert model[low].mean() > 3 * max(model[high].mean(), 1e-30)
    # rank correlation over the limb scans (above-limb only)
    from scipy import stats as sps
    limb = alt > 0
    rho, _ = sps.spearmanr(alt[limb], model[limb])
    assert rho < -0.5

    # fitted source-rate estimate against the synthetic measured profile
    assert result.sourcerate > 0 and np.isfinite(result.sourcerate)


def test_messenger_like_orbit_thermal_and_masked():
    """The same realistic orbit fixture with a GLOBAL thermal source (the
    surface-temperature Maxwellian, F15) instead of the Na spot, plus the
    masking DSL: a minalt400 fit uses only the >= 400 km rungs and still
    converges."""
    orbit = pd.read_csv(os.path.join(os.path.dirname(__file__), 'data',
                                     'orbits', 'messenger_like_orbit.csv'))
    inputs = Input(os.path.join(INPUTFILES, 'mercury_maxwellian_t0.input'))
    inputs.options.endtime = 1500.0
    scdata = SpacecraftData(orbit, species=inputs.options.species,
                            query='messenger-like limb scans, thermal')
    result = scdata.model(inputs, 4000, dphi=math.radians(1.0),
                          label='mlike_thermal', seed=77)
    model = result.radiance.to_numpy()
    assert np.all(np.isfinite(model)) and model.max() > 0
    assert result.sourcerate > 0 and np.isfinite(result.sourcerate)
    # a surface-bound thermal exosphere dims with tangent altitude
    from scipy.stats import spearmanr
    alt = orbit.alttan.to_numpy()
    limb = alt > 0
    rho, _ = spearmanr(alt[limb], model[limb])
    assert rho < -0.6, rho
    # the cold thermal source (H ~ 60 km) leaves NOTHING above 400 km:
    # a minalt400-masked fit correctly collapses to zero
    masked_cold = scdata.model(inputs, 4000, dphi=math.radians(1.0),
                               label='mlike_masked_cold',
                               masking='minalt400', seed=77)
    assert masked_cold.sourcerate == 0.0
    # masking DSL through the scdata.model chain with a source that DOES
    # reach altitude (Ca, 50,000 K): the >= 400 km rungs carry the fit
    hot = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    hot.options.endtime = 1500.0
    sc_hot = SpacecraftData(orbit, species=hot.options.species,
                            query='messenger-like limb scans, hot Ca')
    masked_hot = sc_hot.model(hot, 4000, dphi=math.radians(1.0),
                              label='mlike_masked_hot',
                              masking='minalt400', seed=77)
    assert masked_hot.sourcerate > 0 and np.isfinite(masked_hot.sourcerate)
