"""Independent-implementation cross-check (SURVEY.md section 4: "CPU-reference
(numpy) vs TPU (jit) equality tests per kernel").

A deliberately separate, plain-numpy implementation of the documented
physics — Dormand-Prince RK5(4), point-mass gravity, tabulated radiation
pressure with shadow, log-space photoionization — written from the equations
(not shared code) and compared trajectory-by-trajectory against the jitted
engine with identical initial conditions.  Agreement must be at float64
roundoff level.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                         constant_step_driver,
                                         empty_force_table)

pytestmark = pytest.mark.particle_tracking

GM = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3
RADIUS_KM = 2440.53

# Dormand-Prince coefficients, written out independently
C_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
]
C_B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]


def numpy_rhs(pos, vel, rp_grid, rp_accel, vrplanet, ion_rate, gravity,
              radpres, shadow_ion):
    """dv/dt, d(log f)/dt for a batch (independent implementation)."""
    acc = np.zeros_like(pos)
    if gravity:
        r = np.linalg.norm(pos, axis=1)
        acc += GM * pos / r[:, None] ** 3
    rho2 = pos[:, 0] ** 2 + pos[:, 2] ** 2
    sunlit = (rho2 > 1.0) | (pos[:, 1] < 0.0)
    if radpres:
        vv = vel[:, 1] + vrplanet
        a_rp = np.interp(vv, rp_grid, rp_accel)
        acc[:, 1] += a_rp * sunlit
    rate = ion_rate * (sunlit if shadow_ion else np.ones(len(pos)))
    return acc, rate


def numpy_rk5_step(pos, vel, logf, h, **kw):
    """One Dormand-Prince step (y' = f(y), 6 stages, 5th-order solution)."""
    stage_pos = [pos]
    stage_vel = [vel]
    stage_acc = []
    stage_rate = []
    for i in range(6):
        acc, rate = numpy_rhs(stage_pos[i], stage_vel[i], **kw)
        stage_acc.append(acc)
        stage_rate.append(rate)
        if i == 5:
            break
        dp = np.zeros_like(pos)
        dv = np.zeros_like(vel)
        for j, coef in enumerate(C_A[i + 1]):
            dp += coef * stage_vel[j]
            dv += coef * stage_acc[j]
        stage_pos.append(pos + h * dp)
        stage_vel.append(vel + h * dv)

    new_pos = pos + h * sum(b * v for b, v in zip(C_B, stage_vel))
    new_vel = vel + h * sum(b * a for b, a in zip(C_B, stage_acc))
    new_logf = logf - h * sum(b * r for b, r in zip(C_B, stage_rate))
    return new_pos, new_vel, new_logf


def numpy_constant_driver(pos, vel, frac, h, nsteps, outeredge, **kw):
    logf = np.log(frac)
    alive = frac > 0
    for _ in range(nsteps - 1):
        if not alive.any():
            break
        p, v, lf = numpy_rk5_step(pos[alive], vel[alive], logf[alive], h,
                                  **kw)
        f = np.exp(lf)
        r = np.linalg.norm(p, axis=1)
        f[r < 1.0] = 0.0
        f[r > outeredge] = 0.0
        f[f < 1e-10] = 0.0
        pos[alive], vel[alive], logf[alive] = p, v, np.log(
            np.maximum(f, 1e-300))
        frac[alive] = f
        alive = frac > 0
    return pos, vel, frac


@pytest.mark.parametrize('config', ['gravity', 'full'])
def test_engine_matches_independent_numpy(config):
    rng = np.random.default_rng(42)
    n = 64
    lon = rng.uniform(0, 2 * np.pi, n)
    lat = np.arcsin(rng.uniform(-1, 1, n))
    pos = np.stack([np.sin(lon) * np.cos(lat), -np.cos(lon) * np.cos(lat),
                    np.sin(lat)], axis=1)
    speed = rng.uniform(2.0, 6.0, n) / RADIUS_KM
    vel = pos * speed[:, None]
    frac = np.ones(n)

    rp_grid = np.linspace(-0.03, 0.03, 257)
    rp_accel = (1 + np.sin(rp_grid * 400)) * 4e-8
    vrplanet = 9.7 / RADIUS_KM
    ion_rate = 2e-4
    h, nsteps, outeredge = 30.0, 101, 1e30

    if config == 'gravity':
        gravity, radpres, shadow_ion = True, False, False
    else:
        gravity, radpres, shadow_ion = True, True, True

    ref_pos, ref_vel, ref_frac = numpy_constant_driver(
        pos.copy(), vel.copy(), frac.copy(), h, nsteps, outeredge,
        rp_grid=rp_grid, rp_accel=rp_accel, vrplanet=vrplanet,
        ion_rate=ion_rate if config == 'full' else 0.0,
        gravity=gravity, radpres=radpres, shadow_ion=shadow_ion)

    spec = EngineSpec(gravity=gravity, radpres=radpres,
                      constant_rate=not shadow_ion, surface_bounce=False,
                      check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM),
        vrplanet=jnp.asarray(vrplanet),
        rp_v0=jnp.asarray(rp_grid[0]),
        rp_dv=jnp.asarray(rp_grid[1] - rp_grid[0]),
        rp_accel=jnp.asarray(rp_accel),
        ion_rate=jnp.asarray(ion_rate if config == 'full' else 0.0))
    state0 = PacketState(
        t=jnp.full(n, h * (nsteps - 1)),
        x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
        z=jnp.asarray(pos[:, 2]),
        vx=jnp.asarray(vel[:, 0]), vy=jnp.asarray(vel[:, 1]),
        vz=jnp.asarray(vel[:, 2]),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    final, _ = constant_step_driver(
        state0, spec, forces, None, h, outeredge, RADIUS_KM,
        jax.random.PRNGKey(0), nsteps=nsteps, save_history=False)

    got_pos = np.stack([np.asarray(final.x), np.asarray(final.y),
                        np.asarray(final.z)], axis=1)
    got_vel = np.stack([np.asarray(final.vx), np.asarray(final.vy),
                        np.asarray(final.vz)], axis=1)
    got_frac = np.asarray(final.frac)

    # identical kill decisions
    assert np.array_equal(got_frac == 0, ref_frac == 0)
    alive = ref_frac > 0
    assert alive.sum() > 10
    # trajectory-level agreement at f64 roundoff scale
    assert np.max(np.abs(got_pos[alive] - ref_pos[alive])) < 1e-9
    assert np.max(np.abs(got_vel[alive] - ref_vel[alive])) < 1e-12
    assert np.max(np.abs(got_frac[alive] - ref_frac[alive])) < 1e-12
