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


def test_torus_profile_analytic_decay():
    """Separable torus profile (quirk F23): packets inside the torus decay
    at f(rho) g(z); packets outside the tapered edges do not decay at all
    (profile ends at 0)."""
    from nexoclom_tpu.ops.pltable import compress_points
    rho = np.array([0.0, 4.0, 5.0, 5.9, 7.0, 9.0])
    rate = np.array([0.0, 0.0, 2e-4, 4e-4, 1e-4, 0.0])
    z = np.array([-3.0, -1.0, 0.0, 1.0, 3.0])
    rate_z = np.array([0.0, 0.5, 1.0, 0.5, 0.0])
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0),
        eimp_rho_pl=compress_points(rho, rate, rel_tol=0),
        eimp_z_pl=compress_points(z, rate_z, rel_tol=0))
    # packet 0 at torus peak (rho=5.9, z=0, sunward so no shadow term
    # matters anyway); packet 1 above the torus plane (z=1 -> g=0.5);
    # packet 2 far outside (rho=20 clamps to the 0 end value)
    state0 = PacketState(
        t=jnp.full(3, 1e9),
        x=jnp.zeros(3), y=jnp.asarray([-5.9, -5.9, -20.0]),
        z=jnp.asarray([0.0, 1.0, 0.0]),
        vx=jnp.zeros(3), vy=jnp.zeros(3), vz=jnp.zeros(3),
        frac=jnp.ones(3), lossfrac=jnp.zeros(3))
    h, nsteps = 50.0, 21
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(h), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = h * (nsteps - 1)
    assert float(final.frac[0]) == pytest.approx(math.exp(-4e-4 * T),
                                                 rel=1e-12)
    assert float(final.frac[1]) == pytest.approx(math.exp(-4e-4 * 0.5 * T),
                                                 rel=1e-12)
    assert float(final.frac[2]) == pytest.approx(1.0)


def test_torus_profile_loader_validation():
    from nexoclom_tpu.initial_state.loss_profile import load_loss_profile
    good = {'rho': [0.0, 5.0, 9.0], 'rate': [0.0, 1e-4, 0.0]}
    rho, rate, z, rate_z, phi, rate_phi = load_loss_profile(good)
    assert z is None and rate_z is None and rho[1] == 5.0
    assert phi is None and rate_phi is None
    with pytest.raises(InputError):
        load_loss_profile({'rho': [0, 5], 'rate': [1e-4]})        # mismatch
    with pytest.raises(InputError):
        load_loss_profile({'rho': [5, 0], 'rate': [0, 1e-4]})     # order
    with pytest.raises(InputError):
        load_loss_profile({'rho': [0, 5], 'rate': [-1, 1e-4]})    # negative
    with pytest.raises(InputError):
        load_loss_profile({'rho': [0, 5]})                        # missing
    with pytest.raises(InputError):
        load_loss_profile('/nonexistent/profile.pkl')
    # options grammar: exclusive with the constant rate / lifetime > 0
    base = {'endtime': '3600', 'species': 'Na'}
    with pytest.raises(InputError):
        Options({**base, 'eimp_rate': '1e-4', 'eimp_profile': 'x.pkl'})
    with pytest.raises(InputError):
        Options({**base, 'lifetime': '100', 'eimp_profile': 'x.pkl'})
    assert Options({**base, 'eimp_profile': 'x.pkl'}).eimp_profile == 'x.pkl'


def test_torus_profile_end_to_end(tmp_path):
    """Io satellite run with a torus profile through Input -> Output: the
    torus drains launched packets (they start inside it) vs no profile."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    profile = {'rho': np.array([0.0, 4.0, 5.9, 8.0, 12.0]),
               'rate': np.array([0.0, 1e-4, 5e-4, 1e-4, 0.0]),
               'z': np.array([-4.0, 0.0, 4.0]),
               'rate_z': np.array([0.0, 1.0, 0.0])}
    path = str(tmp_path / 'torus.pkl')
    with open(path, 'wb') as f:
        pickle.dump(profile, f)

    def run(extra):
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        # isolate the torus channel: a negligible generic rate (the
        # grammar forbids combining the profile with lifetime > 0)
        inp.options.lifetime = -1e30
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 128, seed=17, compress=False)
        return out.X.groupby('Index').tail(1).frac.mean()

    plain = run({})
    torus = run({'eimp_profile': path})
    # mean rate ~ 5e-4 near Io's orbit: expect a visible drain over 3600 s
    assert torus < plain * 0.6
    assert torus > 0
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


def test_tilted_torus_static_geometry():
    """Quirk F25: with a static 30-deg tilt toward psi=0 (the +y /
    anti-solar azimuth), decay rates follow rho/z measured from the
    TILTED plane — matching np.interp of the same profile evaluated at
    the analytically rotated coordinates."""
    from nexoclom_tpu.ops.pltable import compress_points
    rho = np.array([0.0, 4.0, 5.0, 5.9, 7.0, 9.0])
    rate = np.array([0.0, 0.0, 2e-4, 4e-4, 1e-4, 0.0])
    z = np.array([-3.0, -1.0, 0.0, 1.0, 3.0])
    rate_z = np.array([0.0, 0.5, 1.0, 0.5, 0.0])
    tilt = math.radians(30.0)
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True, eimp_tilt=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0),
        eimp_rho_pl=compress_points(rho, rate, rel_tol=0),
        eimp_z_pl=compress_points(z, rate_z, rel_tol=0),
        eimp_tilt_sin=jnp.asarray(math.sin(tilt)),
        eimp_tilt_cos=jnp.asarray(math.cos(tilt)),
        eimp_tilt_phase=jnp.asarray(0.0),
        eimp_tilt_omega=jnp.asarray(0.0))
    # normal n = (0, sin(tilt), cos(tilt)); z_c = r.n
    positions = np.array([
        [5.9, 0.0, 0.0],    # on the tilt's node line: unchanged by tilt
        [0.0, -5.9, 0.0],   # spin equator, anti-node: z_c = -5.9 sin(tilt)
        [0.0, 5.0, 1.0],    # general point
    ])
    n_vec = np.array([0.0, math.sin(tilt), math.cos(tilt)])
    z_c = positions @ n_vec
    rho_c = np.sqrt((positions ** 2).sum(1) - z_c ** 2)
    expected_rate = np.interp(rho_c, rho, rate) * np.interp(z_c, z, rate_z)
    state0 = PacketState(
        t=jnp.full(3, 1e9), x=jnp.asarray(positions[:, 0]),
        y=jnp.asarray(positions[:, 1]), z=jnp.asarray(positions[:, 2]),
        vx=jnp.zeros(3), vy=jnp.zeros(3), vz=jnp.zeros(3),
        frac=jnp.ones(3), lossfrac=jnp.zeros(3))
    h, nsteps = 50.0, 21
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(h), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = h * (nsteps - 1)
    for i in range(3):
        assert float(final.frac[i]) == pytest.approx(
            math.exp(-expected_rate[i] * T), rel=1e-10), i


def test_tilted_torus_corotation():
    """With a co-rotating tilt the rate at a FIXED point oscillates at the
    rotation period; the RK-integrated frac matches the exact integral of
    the analytic rate(t) (5th-order quadrature of a smooth sinusoid)."""
    from nexoclom_tpu.ops.pltable import compress_points
    rho = np.array([0.0, 4.0, 5.0, 5.9, 7.0, 9.0])
    rate = np.array([0.0, 0.0, 2e-4, 4e-4, 1e-4, 0.0])
    z = np.array([-3.0, -1.0, 0.0, 1.0, 3.0])
    rate_z = np.array([0.0, 0.5, 1.0, 0.5, 0.0])
    tilt = math.radians(20.0)
    period = 9.925 * 3600.0
    omega = 2.0 * math.pi / period
    phase0 = 0.7
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True, eimp_tilt=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0),
        eimp_rho_pl=compress_points(rho, rate, rel_tol=0),
        eimp_z_pl=compress_points(z, rate_z, rel_tol=0),
        eimp_tilt_sin=jnp.asarray(math.sin(tilt)),
        eimp_tilt_cos=jnp.asarray(math.cos(tilt)),
        eimp_tilt_phase=jnp.asarray(phase0),
        eimp_tilt_omega=jnp.asarray(omega))
    pos = np.array([3.0, -4.5, 0.5])
    h, nsteps = 30.0, 241
    T = h * (nsteps - 1)
    # t counts DOWN from T to 0 (observation)
    state0 = PacketState(
        t=jnp.asarray([T]), x=jnp.asarray([pos[0]]),
        y=jnp.asarray([pos[1]]), z=jnp.asarray([pos[2]]),
        vx=jnp.zeros(1), vy=jnp.zeros(1), vz=jnp.zeros(1),
        frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(h), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)

    def rate_at(t):
        psi = phase0 - omega * t
        n_vec = np.array([-math.sin(tilt) * math.sin(psi),
                          math.sin(tilt) * math.cos(psi), math.cos(tilt)])
        z_c = pos @ n_vec
        rho_c = math.sqrt(pos @ pos - z_c ** 2)
        return np.interp(rho_c, rho, rate) * np.interp(z_c, z, rate_z)

    from scipy.integrate import quad
    integral, _ = quad(rate_at, 0.0, T, limit=400)
    assert float(final.frac[0]) == pytest.approx(math.exp(-integral),
                                                 rel=1e-7)
    # and the rate really oscillates (tilt matters): static tilt at the
    # mean phase would give a different answer
    static = rate_at(0.0) * T
    assert abs(static - integral) > 0.02 * integral


def test_tilt_options_grammar():
    base = {'endtime': '3600', 'species': 'Na', 'eimp_profile': 'x.pkl'}
    opt = Options({**base, 'eimp_tilt': '6.4', 'eimp_tilt_phase': '200',
                   'eimp_tilt_period': '9.925'})
    assert opt.eimp_tilt == 6.4
    assert opt.eimp_tilt_phase == 200.0
    assert opt.eimp_tilt_period == 9.925
    rt = Options.from_dict(opt.to_dict())
    assert rt == opt
    # zero tilt is a no-op; attributes absent (catalog compatibility)
    assert 'eimp_tilt' not in Options({**base, 'eimp_tilt': '0'}).to_dict()
    with pytest.raises(InputError):    # tilt without a profile
        Options({'endtime': '3600', 'species': 'Na', 'eimp_tilt': '6.4'})
    with pytest.raises(InputError):    # out of range
        Options({**base, 'eimp_tilt': '95'})
    with pytest.raises(InputError):    # phase without tilt
        Options({**base, 'eimp_tilt_phase': '200'})
    with pytest.raises(InputError):    # bad period
        Options({**base, 'eimp_tilt': '6.4', 'eimp_tilt_period': '0'})
    # an untilted longitude-structured (F28) profile may still co-rotate
    # at a custom period: the rate is shared between F25 and F28
    opt_f28 = Options({**base, 'eimp_tilt_period': '9.925'})
    assert opt_f28.eimp_tilt_period == 9.925
    assert 'eimp_tilt' not in opt_f28.to_dict()
    with pytest.raises(InputError):   # period without a profile
        Options({'endtime': '3600', 'species': 'Na',
                 'eimp_tilt_period': '9.925'})


def test_tilted_torus_end_to_end(tmp_path):
    """Tilt through the full Input -> Output path: a thin tilted torus
    drains an Io source differently from the untilted one."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    profile = {'rho': np.array([0.0, 4.0, 5.9, 8.0, 12.0]),
               'rate': np.array([0.0, 1e-4, 5e-4, 1e-4, 0.0]),
               'z': np.array([-1.0, 0.0, 1.0]),
               'rate_z': np.array([0.0, 1.0, 0.0])}
    path = str(tmp_path / 'torus.pkl')
    with open(path, 'wb') as f:
        pickle.dump(profile, f)

    def run(extra):
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        inp.options.lifetime = -1e30
        inp.options.eimp_profile = path
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 128, seed=17, compress=False)
        return out.X.groupby('Index').tail(1).frac.mean()

    flat = run({})
    tilted = run({'eimp_tilt': 30.0, 'eimp_tilt_phase': 90.0})
    assert 0 < tilted != flat
    # a 30-deg tilt lifts the thin (|z|<1) torus off most of the orbital
    # plane: packets near Io see less of it
    assert tilted > flat


def test_nonseparable_rate2d_decomposition():
    """Quirk F27: a genuinely non-separable rate2d (two blobs at
    different (rho, z)) decomposes into few separable terms whose sum
    matches the table within the tolerance; a rank-1 field recovers a
    single term exactly."""
    from nexoclom_tpu.initial_state.loss_profile import (decompose_rank,
                                                         profile_tables)
    rho = np.linspace(0.0, 10.0, 41)
    z = np.linspace(-3.0, 3.0, 31)
    blob = lambda r0, z0: (np.exp(-0.5 * ((rho[:, None] - r0) / 1.0) ** 2)
                           * np.exp(-0.5 * ((z[None, :] - z0) / 0.8) ** 2))
    rate2d = 3e-4 * blob(5.9, 1.0) + 1e-4 * blob(3.0, -1.5)
    terms = decompose_rank(rho, z, rate2d, rel_tol_2d=1e-2)
    assert 2 <= len(terms) <= 4
    approx = sum(np.outer(f, g) for f, g in terms)
    assert np.abs(rate2d - approx).max() <= 1e-2 * rate2d.max()

    # rank-1 input -> exactly one term, machine-precision reconstruction
    one = decompose_rank(rho, z, 2e-4 * blob(5.0, 0.0), rel_tol_2d=1e-2)
    assert len(one) == 1

    # loader validation
    from nexoclom_tpu.initial_state.loss_profile import load_loss_profile
    with pytest.raises(InputError):
        load_loss_profile({'rho': rho, 'z': z, 'rate2d': rate2d[:-1]})
    with pytest.raises(InputError):
        load_loss_profile({'rho': rho, 'z': z, 'rate2d': -rate2d})
    rho_pl, z_pl, pairs, phi_pl, cp = profile_tables(
        {'rho': rho, 'z': z, 'rate2d': rate2d}, rel_tol=0)
    assert cp == ()
    assert phi_pl is None
    assert rho_pl is None and z_pl is None and len(pairs) == len(terms)


def test_nonseparable_rate2d_engine_decay():
    """The engine's decay under a rate2d field matches exp(-rate * T)
    with rate from bilinear interpolation of the table, within the SVD
    truncation tolerance."""
    from scipy.interpolate import RegularGridInterpolator
    from nexoclom_tpu.initial_state.loss_profile import profile_tables
    rho = np.linspace(0.0, 10.0, 41)
    z = np.linspace(-3.0, 3.0, 31)
    blob = lambda r0, z0: (np.exp(-0.5 * ((rho[:, None] - r0) / 1.0) ** 2)
                           * np.exp(-0.5 * ((z[None, :] - z0) / 0.8) ** 2))
    rate2d = 3e-4 * blob(5.9, 1.0) + 1e-4 * blob(3.0, -1.5)
    _, _, pairs, _, _ = profile_tables({'rho': rho, 'z': z,
                                        'rate2d': rate2d},
                                       rel_tol=0, rel_tol_2d=1e-3)
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0), eimp_pl_terms=pairs)
    positions = np.array([[0.0, -5.9, 1.0],     # first blob peak
                          [3.0, 0.0, -1.5],     # second blob peak
                          [0.0, -4.5, 0.0],     # between the blobs
                          [0.0, -9.9, 2.9]])    # far corner, ~0 rate
    state0 = PacketState(
        t=jnp.full(4, 1e9), x=jnp.asarray(positions[:, 0]),
        y=jnp.asarray(positions[:, 1]), z=jnp.asarray(positions[:, 2]),
        vx=jnp.zeros(4), vy=jnp.zeros(4), vz=jnp.zeros(4),
        frac=jnp.ones(4), lossfrac=jnp.zeros(4))
    h, nsteps = 50.0, 21
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(h), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = h * (nsteps - 1)
    interp = RegularGridInterpolator((rho, z), rate2d)
    rho_c = np.hypot(positions[:, 0], positions[:, 1])
    expected = interp(np.stack([rho_c, positions[:, 2]], axis=1))
    for i in range(4):
        assert float(final.frac[i]) == pytest.approx(
            math.exp(-expected[i] * T), rel=3e-3), i


def test_nonseparable_rate2d_end_to_end(tmp_path):
    """rate2d through Input -> Output, combined with the tilt (F25+F27):
    a blob field pinned near Io's orbit drains an Io source."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    rho = np.linspace(0.0, 12.0, 25)
    z = np.linspace(-3.0, 3.0, 13)
    rate2d = (5e-4 * np.exp(-0.5 * ((rho[:, None] - 5.9) / 1.0) ** 2)
              * np.exp(-0.5 * (z[None, :] / 1.0) ** 2))
    path = str(tmp_path / 'torus2d.pkl')
    with open(path, 'wb') as f:
        pickle.dump({'rho': rho, 'z': z, 'rate2d': rate2d}, f)

    def run(extra):
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        inp.options.lifetime = -1e30
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 128, seed=17, compress=False)
        return out.X.groupby('Index').tail(1).frac.mean()

    plain = run({})
    torus = run({'eimp_profile': path})
    tilted = run({'eimp_profile': path, 'eimp_tilt': 30.0})
    assert 0 < torus < plain * 0.8
    assert 0 < tilted != torus


def test_longitude_factor_loader_validation():
    """Quirk F28 grammar: phi/rate_phi must be a periodic factor over
    exactly [0, 2 pi]."""
    from nexoclom_tpu.initial_state.loss_profile import (load_loss_profile,
                                                         profile_tables)
    base = {'rho': [0.0, 5.0, 9.0], 'rate': [0.0, 1e-4, 0.0]}
    phi = np.linspace(0, 2 * np.pi, 25)
    good = {**base, 'phi': phi, 'rate_phi': 1 + 0.3 * np.cos(phi)}
    out = load_loss_profile(good)
    assert out[4] is not None and len(out) == 6
    _, _, _, phi_pl, _ = profile_tables(good, rel_tol=0)
    assert phi_pl is not None
    with pytest.raises(InputError):      # only one of the pair
        load_loss_profile({**base, 'phi': phi})
    with pytest.raises(InputError):      # not periodic
        load_loss_profile({**base, 'phi': phi, 'rate_phi': phi})
    with pytest.raises(InputError):      # wrong span
        load_loss_profile({**base, 'phi': phi / 2,
                           'rate_phi': np.ones(25)})
    with pytest.raises(InputError):      # negative factor
        load_loss_profile({**base, 'phi': phi,
                           'rate_phi': np.cos(phi)})
    # options grammar: phase requires a profile
    with pytest.raises(InputError):
        Options({'endtime': '3600', 'species': 'Na',
                 'eimp_phi_phase': '200'})


@pytest.mark.filterwarnings(
    'ignore::scipy.integrate.IntegrationWarning')
def test_longitude_factor_static_and_corotating():
    """The System III factor h(phi_sys): static case matches np.interp at
    the packet's azimuth; co-rotating case matches quad() of the analytic
    time-varying rate."""
    from nexoclom_tpu.ops.pltable import compress_points
    rho = np.array([0.0, 4.0, 5.0, 5.9, 7.0, 9.0])
    rate = np.array([0.0, 0.0, 2e-4, 4e-4, 1e-4, 0.0])
    phi = np.linspace(0, 2 * np.pi, 49)
    h = 1.0 + 0.4 * np.cos(phi - 1.0)
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True, eimp_phi=True)
    base_forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0),
        eimp_rho_pl=compress_points(rho, rate, rel_tol=0),
        eimp_phi_pl=compress_points(phi, h, rel_tol=0))

    # static (omega = 0, phase = 0): three azimuths at the torus peak
    positions = np.array([[0.0, -5.9, 0.0],    # azimuth pi (sunward)
                          [-5.9, 0.0, 0.0],    # azimuth pi/2
                          [4.0, 4.34, 0.0]])   # azimuth atan2(-4, 4.34)
    forces = base_forces._replace(eimp_phi_phase=jnp.asarray(0.0),
                                  eimp_rot_omega=jnp.asarray(0.0))
    state0 = PacketState(
        t=jnp.full(3, 1e9), x=jnp.asarray(positions[:, 0]),
        y=jnp.asarray(positions[:, 1]), z=jnp.asarray(positions[:, 2]),
        vx=jnp.zeros(3), vy=jnp.zeros(3), vz=jnp.zeros(3),
        frac=jnp.ones(3), lossfrac=jnp.zeros(3))
    hstep, nsteps = 50.0, 21
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(hstep), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = hstep * (nsteps - 1)
    for i, pos in enumerate(positions):
        az = math.atan2(-pos[0], pos[1]) % (2 * math.pi)
        rho_c = math.hypot(pos[0], pos[1])
        expected = np.interp(rho_c, rho, rate) * np.interp(az, phi, h)
        assert float(final.frac[i]) == pytest.approx(
            math.exp(-expected * T), rel=1e-9), i

    # co-rotating: fixed point, h sweeps past it at omega_rot
    omega = 2.0 * math.pi / (9.925 * 3600.0)
    phase0 = 0.7
    forces = base_forces._replace(eimp_phi_phase=jnp.asarray(phase0),
                                  eimp_rot_omega=jnp.asarray(omega))
    pos = np.array([3.0, -4.5, 0.0])
    hstep, nsteps = 30.0, 241
    T = hstep * (nsteps - 1)
    state0 = PacketState(
        t=jnp.asarray([T]), x=jnp.asarray([pos[0]]),
        y=jnp.asarray([pos[1]]), z=jnp.asarray([pos[2]]),
        vx=jnp.zeros(1), vy=jnp.zeros(1), vz=jnp.zeros(1),
        frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(hstep), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    az = math.atan2(-pos[0], pos[1])
    rho_c = math.hypot(pos[0], pos[1])
    f_rho = np.interp(rho_c, rho, rate)

    def rate_at(t):
        phi_sys = (az - (phase0 - omega * t)) % (2 * math.pi)
        return f_rho * np.interp(phi_sys, phi, h)

    from scipy.integrate import quad
    integral = quad(rate_at, 0.0, T, limit=400)[0]
    assert float(final.frac[0]) == pytest.approx(math.exp(-integral),
                                                 rel=1e-6)


def test_longitude_factor_end_to_end(tmp_path):
    """F28 through Input -> Output, composed with the tilt (F25): a
    System III-modulated tilted torus runs and differs from the
    unmodulated one."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    phi = np.linspace(0, 2 * np.pi, 37)
    profile = {'rho': np.array([0.0, 4.0, 5.9, 8.0, 12.0]),
               'rate': np.array([0.0, 1e-4, 5e-4, 1e-4, 0.0]),
               'z': np.array([-2.0, 0.0, 2.0]),
               'rate_z': np.array([0.0, 1.0, 0.0]),
               'phi': phi, 'rate_phi': 1 + 0.8 * np.cos(phi)}
    path = str(tmp_path / 'torus_sys3.pkl')
    with open(path, 'wb') as f:
        pickle.dump(profile, f)
    flat = dict(profile)
    del flat['phi'], flat['rate_phi']
    path_flat = str(tmp_path / 'torus_flat.pkl')
    with open(path_flat, 'wb') as f:
        pickle.dump(flat, f)

    def run(profile_path, extra):
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        inp.options.lifetime = -1e30
        inp.options.eimp_profile = profile_path
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 128, seed=17, compress=False)
        return out.X.groupby('Index').tail(1).frac.mean()

    base = run(path_flat, {})
    sys3 = run(path, {'eimp_phi_phase': 90.0, 'eimp_tilt': 6.4})
    assert 0 < sys3 != base


def test_azimuth_convention_matches_orbit_phase():
    """The F28 azimuth (atan2(-x, y)) and the moon orbital phase share
    one convention: a point AT the moon's position has azimuth equal to
    the moon's phi — so a longitude factor peaked at Io's longitude
    really peaks at Io."""
    from nexoclom_tpu.ops.integrator import orbit_state
    for phase in (0.0, 1.0, 2.5, 4.71, 6.0):
        x, y, _, _ = orbit_state(5.9, 1e-4, phase, xp=np)
        az = math.atan2(-x, y) % (2 * math.pi)
        assert az == pytest.approx(phase % (2 * math.pi), abs=1e-12)


def test_adaptive_driver_with_full_field_stack(tmp_path):
    """The ADAPTIVE driver (the reference's primary mode) handles the
    tilted, longitude-modulated torus too — the time-dependent field
    evaluation rides the same per-stage t as the moving moon."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    phi = np.linspace(0, 2 * np.pi, 25)
    profile = {'rho': np.array([0.0, 4.0, 5.9, 8.0, 12.0]),
               'rate': np.array([0.0, 1e-4, 5e-4, 1e-4, 0.0]),
               'phi': phi, 'rate_phi': 1 + 0.5 * np.cos(phi)}
    path = str(tmp_path / 'torus.pkl')
    with open(path, 'wb') as f:
        pickle.dump(profile, f)
    inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
    inp.options.endtime = 600.0
    inp.options.step_size = 0.0          # adaptive
    inp.options.resolution = 1e-3
    inp.options.lifetime = -1e30
    inp.options.eimp_profile = path
    inp.options.eimp_tilt = 6.4
    inp.options.eimp_phi_phase = 90.0
    out = Output(inp, 64, seed=23, compress=False)
    frac = out.X.frac.to_numpy()
    assert np.all(np.isfinite(frac)) and np.all((frac >= 0) & (frac <= 1))
    assert frac.max() < 1.0              # the torus drained something


def test_cp_rate3d_decomposition_and_loader():
    """Quirk F29: a fully coupled rate3d (a ribbon whose radial peak
    drifts with System III longitude) CP-decomposes into few separable
    triples matching the tensor within tolerance; a separable field
    recovers one term; the loader rejects malformed tensors."""
    from nexoclom_tpu.initial_state.loss_profile import (decompose_cp,
                                                         load_loss_profile,
                                                         profile_tables)
    rho = np.linspace(0.0, 10.0, 41)
    phi = np.linspace(0, 2 * np.pi, 49)
    z = np.linspace(-3.0, 3.0, 31)
    r0 = 5.9 + 0.6 * np.cos(phi)
    rate3d = (3e-4
              * np.exp(-0.5 * ((rho[:, None, None]
                                - r0[None, :, None]) / 1.0) ** 2)
              * np.exp(-0.5 * (z[None, None, :] / 0.9) ** 2)
              * (1 + 0.25 * np.sin(2 * phi))[None, :, None])
    a_mat, b_mat, c_mat = decompose_cp(rate3d, rel_tol_3d=1e-2)
    assert 2 <= a_mat.shape[1] <= 6
    approx = np.einsum('ik,jk,lk->ijl', a_mat, b_mat, c_mat)
    assert np.abs(rate3d - approx).max() <= 1e-2 * rate3d.max()

    # separable input -> a single triple
    sep = 2e-4 * np.einsum('i,j,l->ijl', np.exp(-0.5 * ((rho - 5) / 2) ** 2),
                           np.ones_like(phi), np.exp(-0.5 * z ** 2))
    assert decompose_cp(sep, rel_tol_3d=1e-2)[0].shape[1] == 1

    good = {'rho': rho, 'phi': phi, 'z': z, 'rate3d': rate3d}
    out = load_loss_profile(good)
    assert out[1] is None and out[3].ndim == 3 and out[5] is None
    r_pl, z_pl, pairs, phi_pl, cp = profile_tables(good, rel_tol=1e-4)
    assert r_pl is None and z_pl is None and pairs == () and phi_pl is None
    assert len(cp) >= 2 and all(len(t) == 3 for t in cp)

    with pytest.raises(InputError):     # wrong tensor shape
        load_loss_profile({**good, 'rate3d': rate3d[:-1]})
    with pytest.raises(InputError):     # negative rates
        load_loss_profile({**good, 'rate3d': -rate3d})
    with pytest.raises(InputError):     # phi span
        load_loss_profile({**good, 'phi': phi / 2,
                           'rate3d': rate3d})
    with pytest.raises(InputError):     # not periodic in phi
        bad = rate3d.copy()
        bad[:, 0, :] *= 2.0
        load_loss_profile({**good, 'rate3d': bad})
    with pytest.raises(InputError):     # rate3d + rate_phi contradictory
        load_loss_profile({**good, 'rate_phi': np.ones_like(phi)})
    with pytest.raises(InputError):     # rate3d + rate2d contradictory
        load_loss_profile({**good, 'rate2d': rate3d[:, 0, :]})


def test_cp_rate3d_engine_decay_static():
    """Engine decay under a static CP field matches exp(-rate T) with
    rate from trilinear interpolation of the tensor."""
    from scipy.interpolate import RegularGridInterpolator
    from nexoclom_tpu.initial_state.loss_profile import profile_tables
    rho = np.linspace(0.0, 10.0, 41)
    phi = np.linspace(0, 2 * np.pi, 49)
    z = np.linspace(-3.0, 3.0, 31)
    r0 = 5.9 + 0.6 * np.cos(phi)
    rate3d = (3e-4
              * np.exp(-0.5 * ((rho[:, None, None]
                                - r0[None, :, None]) / 1.0) ** 2)
              * np.exp(-0.5 * (z[None, None, :] / 0.9) ** 2))
    _, _, _, _, cp = profile_tables({'rho': rho, 'phi': phi, 'z': z,
                                     'rate3d': rate3d},
                                    rel_tol=1e-5, rel_tol_2d=1e-3)
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True, eimp_phi=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0), eimp_cp_terms=cp,
        eimp_phi_phase=jnp.asarray(0.0), eimp_rot_omega=jnp.asarray(0.0))
    positions = np.array([[0.0, -6.5, 0.5],    # azimuth pi: peak at 5.3
                          [-5.9, 0.0, 0.0],    # azimuth pi/2
                          [4.0, 4.34, -1.0],   # mixed azimuth, below plane
                          [0.0, 9.9, 2.9]])    # near-zero corner
    state0 = PacketState(
        t=jnp.full(4, 1e9), x=jnp.asarray(positions[:, 0]),
        y=jnp.asarray(positions[:, 1]), z=jnp.asarray(positions[:, 2]),
        vx=jnp.zeros(4), vy=jnp.zeros(4), vz=jnp.zeros(4),
        frac=jnp.ones(4), lossfrac=jnp.zeros(4))
    hstep, nsteps = 50.0, 21
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(hstep), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    T = hstep * (nsteps - 1)
    interp = RegularGridInterpolator((rho, phi, z), rate3d)
    for i, pos in enumerate(positions):
        az = math.atan2(-pos[0], pos[1]) % (2 * math.pi)
        rho_c = math.hypot(pos[0], pos[1])
        expected = float(interp([rho_c, az, pos[2]])[0])
        assert float(final.frac[i]) == pytest.approx(
            math.exp(-expected * T), rel=5e-3), i


@pytest.mark.filterwarnings(
    'ignore::scipy.integrate.IntegrationWarning')
def test_cp_rate3d_corotating():
    """A co-rotating CP field sweeps its longitude structure past a fixed
    packet; the RK-integrated decay matches quad() of the analytic
    rate(t) from trilinear interpolation."""
    from scipy.integrate import quad
    from scipy.interpolate import RegularGridInterpolator
    from nexoclom_tpu.initial_state.loss_profile import profile_tables
    rho = np.linspace(0.0, 10.0, 41)
    phi = np.linspace(0, 2 * np.pi, 49)
    z = np.linspace(-3.0, 3.0, 31)
    r0 = 5.9 + 0.6 * np.cos(phi)
    rate3d = (3e-4
              * np.exp(-0.5 * ((rho[:, None, None]
                                - r0[None, :, None]) / 1.0) ** 2)
              * np.exp(-0.5 * (z[None, None, :] / 0.9) ** 2))
    _, _, _, _, cp = profile_tables({'rho': rho, 'phi': phi, 'z': z,
                                     'rate3d': rate3d},
                                    rel_tol=1e-5, rel_tol_2d=1e-3)
    omega = 2.0 * math.pi / (9.925 * 3600.0)
    phase0 = 0.7
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      eimp_profile=True, eimp_phi=True)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(0.0), eimp_cp_terms=cp,
        eimp_phi_phase=jnp.asarray(phase0),
        eimp_rot_omega=jnp.asarray(omega))
    pos = np.array([3.0, -4.8, 0.4])
    hstep, nsteps = 30.0, 241
    T = hstep * (nsteps - 1)
    state0 = PacketState(
        t=jnp.asarray([T]), x=jnp.asarray([pos[0]]),
        y=jnp.asarray([pos[1]]), z=jnp.asarray([pos[2]]),
        vx=jnp.zeros(1), vy=jnp.zeros(1), vz=jnp.zeros(1),
        frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(hstep), jnp.asarray(1e30),
        jnp.asarray(71492.0), jax.random.PRNGKey(0), nsteps=nsteps,
        save_history=False)
    az = math.atan2(-pos[0], pos[1])
    rho_c = math.hypot(pos[0], pos[1])
    interp = RegularGridInterpolator((rho, phi, z), rate3d)

    def rate_at(t):
        phi_sys = (az - (phase0 - omega * t)) % (2 * math.pi)
        return float(interp([rho_c, phi_sys, pos[2]])[0])

    integral = quad(rate_at, 0.0, T, limit=400)[0]
    assert float(final.frac[0]) == pytest.approx(math.exp(-integral),
                                                 rel=5e-3)


def test_cp_rate3d_end_to_end(tmp_path):
    """F29 through Input -> Output, composed with the tilt (F25): a fully
    coupled co-rotating torus runs and differs from its
    longitude-averaged 2-D counterpart."""
    import pickle
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    rho = np.linspace(0.0, 12.0, 25)
    phi = np.linspace(0, 2 * np.pi, 25)
    z = np.linspace(-3.0, 3.0, 13)
    r0 = 5.9 + 0.8 * np.cos(phi)
    rate3d = (5e-4
              * np.exp(-0.5 * ((rho[:, None, None]
                                - r0[None, :, None]) / 1.0) ** 2)
              * np.exp(-0.5 * (z[None, None, :] / 1.0) ** 2))
    path3d = str(tmp_path / 'torus3d.pkl')
    with open(path3d, 'wb') as f:
        pickle.dump({'rho': rho, 'phi': phi, 'z': z, 'rate3d': rate3d}, f)
    path2d = str(tmp_path / 'torus2d.pkl')
    with open(path2d, 'wb') as f:
        pickle.dump({'rho': rho, 'z': z,
                     'rate2d': rate3d.mean(axis=1)}, f)

    def run(profile_path, extra):
        inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
        inp.options.endtime = 3600.0
        inp.options.step_size = 30.0
        inp.options.lifetime = -1e30
        inp.options.eimp_profile = profile_path
        for key, value in extra.items():
            setattr(inp.options, key, value)
        out = Output(inp, 128, seed=17, compress=False)
        return out.X.groupby('Index').tail(1).frac.mean()

    flat = run(path2d, {})
    full = run(path3d, {'eimp_phi_phase': 90.0, 'eimp_tilt': 6.4})
    assert 0 < full != flat
    assert 0 < flat < 1
