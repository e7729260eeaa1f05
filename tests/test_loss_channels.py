"""Electron-impact / charge-exchange loss channels (quirk F22).

The reference stubs both forever (``LossInfo.py:9-10`` initialises them to
0; ``state.py:56-72`` comments out ``ionizerate = photorate + eimprate +
chxrate``). This build implements the sum with constant rates:
electron impact applies everywhere (electrons are not blocked by the
planet's shadow), charge exchange is shadow-masked like the photo rate.
"""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.initial_state.sections import Options
from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                         constant_step_driver,
                                         empty_force_table)
from nexoclom_tpu.utilities.exceptions import InputError

pytestmark = pytest.mark.particle_tracking

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def test_analytic_decay_sunlit_and_shadowed():
    """Sunlit: frac = exp(-(photo+chx+eimp) T).  In the planet's shadow
    only the electron-impact term survives: frac = exp(-eimp T)."""
    photo, chx, eimp = 2e-4, 5e-5, 3e-5
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp=True, chx=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(photo),
        eimp_rate=jnp.asarray(eimp), chx_rate=jnp.asarray(chx))
    # packet 0 sunlit (y < 0), packet 1 in the shadow cylinder (rho < 1,
    # y > 0)
    state0 = PacketState(
        t=jnp.full(2, 1e9), x=jnp.zeros(2),
        y=jnp.asarray([-5.0, 5.0]), z=jnp.zeros(2),
        vx=jnp.zeros(2), vy=jnp.zeros(2), vz=jnp.zeros(2),
        frac=jnp.ones(2), lossfrac=jnp.zeros(2))
    h, nsteps = 100.0, 11
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(h), jnp.asarray(1e30),
        jnp.asarray(2440.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = h * (nsteps - 1)
    assert float(final.frac[0]) == pytest.approx(
        math.exp(-(photo + chx + eimp) * T), rel=1e-12)
    assert float(final.frac[1]) == pytest.approx(
        math.exp(-eimp * T), rel=1e-12)


def test_options_grammar():
    base = {'endtime': '3600', 'species': 'Na'}
    # absent -> attributes absent -> canonical dict unchanged vs
    # pre-extension catalogs
    opt = Options(dict(base))
    assert 'eimp_rate' not in opt.to_dict()
    assert 'chx_rate' not in opt.to_dict()

    opt = Options({**base, 'eimp_rate': '1e-4', 'chx_rate': '2e-5'})
    assert opt.eimp_rate == 1e-4 and opt.chx_rate == 2e-5
    # round-trips through the canonical dict
    rt = Options.from_dict(opt.to_dict())
    assert rt == opt

    with pytest.raises(InputError):
        Options({**base, 'lifetime': '100', 'eimp_rate': '1e-4'})
    with pytest.raises(InputError):
        Options({**base, 'eimp_rate': '-1'})
    # zero is a no-op, not an error
    assert 'eimp_rate' not in Options({**base, 'eimp_rate': '0'}).to_dict()


def test_end_to_end_eimp_reduces_frac():
    """An eimp rate drains packets that photo loss alone would not
    (including in shadow), through the full Input -> Output path."""
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output

    def total_frac(extra):
        inp = Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 200, seed=6, compress=False)
        return out.X.groupby('Index').tail(1).frac.sum()

    plain = total_frac({})
    drained = total_frac({'eimp_rate': 3e-4})
    assert drained < plain * 0.5
    # LossInfo reports the channels
    from nexoclom_tpu.initial_state.loss_info import LossInfo
    info = LossInfo('Na', 0.0, 0.35, eimp=1e-4, chX=2e-5)
    s = str(info)
    assert 'Electron Impact Rate' in s and 'Charge Exchange Rate' in s
