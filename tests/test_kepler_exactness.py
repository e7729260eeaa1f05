"""Integrator vs the EXACT two-body solution.

The reference's only trajectory test is energy conservation
(``tests/unit_tests/particle_tracking/test_gravity.py:46-55``), which a
wrong time parametrization would still pass.  These tests pin the engine
against the closed-form Kepler solution r(t) — radial orbits (Barker-type
eccentric-anomaly parametrization), oblique ellipses, and circular-orbit
closure after exactly one period — so timing, not just the energy
integral, is validated at every step.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                         constant_step_driver,
                                         empty_force_table)

pytestmark = pytest.mark.particle_tracking

GM = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3      # Mercury, R_p^3/s^2
MU = -GM
V_ESC = math.sqrt(2.0 * MU)
RADIUS_KM = 2440.53
SPEC = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                  surface_bounce=False, check_outer_edge=False)
KEY = jax.random.PRNGKey(3)


def forces():
    return empty_force_table(jnp.float64)._replace(gm=jnp.asarray(GM))


def solve_kepler(mean_anom, e, iters=80):
    """Vectorized Newton solve of E - e sin(E) = M (e <= 1 incl. radial)."""
    ecc = np.where(e > 0.8, np.full_like(mean_anom, np.pi),
                   np.asarray(mean_anom, np.float64))
    for _ in range(iters):
        f = ecc - e * np.sin(ecc) - mean_anom
        fp = 1.0 - e * np.cos(ecc)
        ecc = ecc - f / np.maximum(fp, 1e-12)
    return ecc


def radial_r_of_age(v0, ages):
    """Exact r(age) for a radial launch from r0 = 1 at speed v0 < v_esc.

    Degenerate-ellipse parametrization: r = a (1 - cos eta),
    t_from_focus = (eta - sin eta) / n.  Returns (r, t_flight)."""
    energy = 0.5 * v0 ** 2 - MU
    a = -MU / (2.0 * energy)                # a = r_apex / 2 in units of r0
    n_mot = math.sqrt(MU / a ** 3)
    eta0 = math.acos(np.clip(1.0 - 1.0 / a, -1.0, 1.0))
    t0 = (eta0 - math.sin(eta0)) / n_mot
    t_land = ((2.0 * math.pi - eta0) - math.sin(2.0 * math.pi - eta0)) / n_mot
    mean = (t0 + ages) * n_mot
    eta = solve_kepler(mean, 1.0)
    return a * (1.0 - np.cos(eta)), t_land - t0


def test_radial_trajectories_match_exact_kepler():
    """Radial launches at 0.3/0.6/0.9 v_esc: the engine's r at EVERY step
    matches the closed-form radial Kepler orbit to 1e-8 R_p (~2.4 cm)."""
    speeds = np.array([0.3, 0.6, 0.9]) * V_ESC
    n = len(speeds)
    rng = np.random.default_rng(5)
    lon = rng.uniform(0, 2 * np.pi, n)
    lat = np.arcsin(rng.uniform(-1, 1, n))
    pos = np.stack([np.sin(lon) * np.cos(lat), -np.cos(lon) * np.cos(lat),
                    np.sin(lat)], axis=1)
    state0 = PacketState(
        t=jnp.full(n, 1e6), x=jnp.asarray(pos[:, 0]),
        y=jnp.asarray(pos[:, 1]), z=jnp.asarray(pos[:, 2]),
        vx=jnp.asarray(speeds * pos[:, 0]),
        vy=jnp.asarray(speeds * pos[:, 1]),
        vz=jnp.asarray(speeds * pos[:, 2]),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    h, nsteps = 30.0, 400
    _, hist = constant_step_driver(
        state0, SPEC, forces(), None, h, 1e30, RADIUS_KM, KEY,
        nsteps=nsteps, save_history=True)
    r_eng = np.sqrt(np.asarray(hist.x) ** 2 + np.asarray(hist.y) ** 2 +
                    np.asarray(hist.z) ** 2)           # (nsteps-1, n)
    ages = h * np.arange(1, r_eng.shape[0] + 1)
    live = np.asarray(hist.frac) > 0
    for i, v0 in enumerate(speeds):
        r_exact, t_flight = radial_r_of_age(v0, ages)
        sel = live[:, i] & (ages < t_flight - 2 * h)
        assert sel.sum() > 10
        assert np.abs(r_eng[sel, i] - r_exact[sel]).max() < 1e-8, v0


def test_oblique_trajectory_matches_exact_kepler():
    """A 45-degree launch at 0.7 v_esc follows the exact elliptic r(t)."""
    v0 = 0.7 * V_ESC
    vr, vt = v0 / math.sqrt(2), v0 / math.sqrt(2)
    # elements from (r0=1, vr, vt)
    energy = 0.5 * v0 ** 2 - MU
    a = -MU / (2.0 * energy)
    ell = vt                                    # L = r0 * vt
    e = math.sqrt(max(0.0, 1.0 + 2.0 * energy * ell ** 2 / MU ** 2))
    n_mot = math.sqrt(MU / a ** 3)
    cosE0 = (1.0 - 1.0 / a) / e
    ecc0 = math.acos(np.clip(cosE0, -1, 1))     # vr > 0: ascending branch
    m0 = ecc0 - e * math.sin(ecc0)
    # impact: same radius, descending -> E = 2 pi - E0
    t_impact = ((2 * math.pi - ecc0 - e * math.sin(2 * math.pi - ecc0))
                - m0) / n_mot

    state0 = PacketState(
        t=jnp.asarray([1e6]), x=jnp.asarray([0.0]), y=jnp.asarray([-1.0]),
        z=jnp.asarray([0.0]), vx=jnp.asarray([vt]), vy=jnp.asarray([-vr]),
        vz=jnp.asarray([0.0]), frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    h, nsteps = 30.0, 600
    _, hist = constant_step_driver(
        state0, SPEC, forces(), None, h, 1e30, RADIUS_KM, KEY,
        nsteps=nsteps, save_history=True)
    r_eng = np.sqrt(np.asarray(hist.x)[:, 0] ** 2 +
                    np.asarray(hist.y)[:, 0] ** 2 +
                    np.asarray(hist.z)[:, 0] ** 2)
    ages = h * np.arange(1, len(r_eng) + 1)
    ecc = solve_kepler(m0 + n_mot * ages, e)
    r_exact = a * (1.0 - e * np.cos(ecc))
    sel = (np.asarray(hist.frac)[:, 0] > 0) & (ages < t_impact - 2 * h)
    assert sel.sum() > 100
    assert np.abs(r_eng[sel] - r_exact[sel]).max() < 1e-8


def test_circular_orbit_closes_after_one_period():
    """A circular orbit at r = 1.5 returns to its starting position after
    exactly T = 2 pi sqrt(r^3/mu) — pinning the time parametrization, which
    energy conservation alone cannot."""
    r0 = 1.5
    vc = math.sqrt(MU / r0)
    period = 2.0 * math.pi * math.sqrt(r0 ** 3 / MU)
    nsteps = 201
    h = period / (nsteps - 1)
    state0 = PacketState(
        t=jnp.asarray([1e6]), x=jnp.asarray([r0]), y=jnp.asarray([0.0]),
        z=jnp.asarray([0.0]), vx=jnp.asarray([0.0]), vy=jnp.asarray([vc]),
        vz=jnp.asarray([0.0]), frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    final, hist = constant_step_driver(
        state0, SPEC, forces(), None, h, 1e30, RADIUS_KM, KEY,
        nsteps=nsteps, save_history=True)
    # radius pinned throughout
    r_hist = np.sqrt(np.asarray(hist.x) ** 2 + np.asarray(hist.y) ** 2 +
                     np.asarray(hist.z) ** 2)
    assert np.abs(r_hist - r0).max() < 1e-9
    # closure: back at the start after one period
    gap = math.hypot(float(final.x[0]) - r0, float(final.y[0]))
    assert gap < 1e-7 * r0
