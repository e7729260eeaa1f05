"""Engine physics-invariant tests (mirrors the reference's
``test_gravity.py`` energy-conservation strategy, plus analytic checks of
each force/loss term and adaptive-vs-constant agreement)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.ops.integrator import (EngineSpec, ForceTable, PacketState,
                                         adaptive_step_driver,
                                         constant_step_driver,
                                         empty_force_table, rk5_step)

pytestmark = pytest.mark.particle_tracking

GM_MERCURY = -6.6743e-11 * 3.30103e23 / (2440.53e3) ** 3  # R_p^3/s^2
RADIUS_KM = 2440.53
KEY = jax.random.PRNGKey(7)


def make_state(n=64, seed=0, r0=1.0, vmin=2.0, vmax=8.0, endtime=20000.0):
    """Radially-launched packets with a spread of speeds (km/s -> model)."""
    rng = np.random.default_rng(seed)
    lon = rng.uniform(0, 2 * np.pi, n)
    sinlat = rng.uniform(-1, 1, n)
    lat = np.arcsin(sinlat)
    x = r0 * np.sin(lon) * np.cos(lat)
    y = -r0 * np.cos(lon) * np.cos(lat)
    z = r0 * np.sin(lat)
    v = rng.uniform(vmin, vmax, n) / RADIUS_KM
    return PacketState(
        t=jnp.full(n, endtime), x=jnp.asarray(x), y=jnp.asarray(y),
        z=jnp.asarray(z), vx=jnp.asarray(v * x / r0),
        vy=jnp.asarray(v * y / r0), vz=jnp.asarray(v * z / r0),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))


def gravity_forces():
    return empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM_MERCURY))


GRAVITY_SPEC = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                          surface_bounce=False, check_outer_edge=False)


def energy(state):
    ke = 0.5 * (np.asarray(state.vx) ** 2 + np.asarray(state.vy) ** 2 +
                np.asarray(state.vz) ** 2)
    r = np.sqrt(np.asarray(state.x) ** 2 + np.asarray(state.y) ** 2 +
                np.asarray(state.z) ** 2)
    return ke + GM_MERCURY / r


def test_energy_conservation_constant_step():
    state0 = make_state(n=128, vmin=3.0, vmax=8.0)
    nsteps = int(np.ceil(20000.0 / 30.0 + 1))
    final, history = constant_step_driver(
        state0, GRAVITY_SPEC, gravity_forces(), None, 30.0, 1e30, RADIUS_KM,
        KEY, nsteps=nsteps, save_history=True)

    e0 = energy(state0)
    alive = np.asarray(final.frac) > 0
    assert alive.sum() > 10
    # per-trajectory energy at every surviving snapshot
    hx = np.asarray(history.x)
    hfrac = np.asarray(history.frac)
    # dead lanes park at the origin (r=0 -> inf energy); masked by `live`
    with np.errstate(divide='ignore', invalid='ignore'):
        e_hist = (0.5 * (np.asarray(history.vx) ** 2
                         + np.asarray(history.vy) ** 2
                         + np.asarray(history.vz) ** 2) +
                  GM_MERCURY / np.sqrt(hx ** 2 + np.asarray(history.y) ** 2 +
                                       np.asarray(history.z) ** 2))
    live = hfrac > 0
    rel_err = np.abs(e_hist - e0[None, :]) / np.abs(e0[None, :])
    # RK5 truncation at h=30 s accumulates ~2e-8 over 667 steps; 1e-6 bounds
    # it with margin while still catching force-term sign/scale errors
    assert np.nanmax(np.where(live, rel_err, 0.0)) < 1e-6


def test_escape_speed_partition():
    """Packets above escape speed must survive outbound; slow packets must
    fall back and die on the (fully sticking) surface."""
    n = 32
    v_esc = math.sqrt(2 * abs(GM_MERCURY))  # from r=1, model units
    fast = make_state(n=n, vmin=v_esc * RADIUS_KM * 1.3,
                      vmax=v_esc * RADIUS_KM * 2.0, endtime=40000.0)
    slow = make_state(n=n, vmin=1.0, vmax=2.0, endtime=40000.0)
    nsteps = int(np.ceil(40000.0 / 30.0 + 1))
    for state0, survive in ((fast, True), (slow, False)):
        final, _ = constant_step_driver(
            state0, GRAVITY_SPEC, gravity_forces(), None, 30.0, 1e30,
            RADIUS_KM, KEY, nsteps=nsteps, save_history=False)
        frac = np.asarray(final.frac)
        if survive:
            assert np.all(frac == 1.0)
            r = np.sqrt(np.asarray(final.x) ** 2 + np.asarray(final.y) ** 2 +
                        np.asarray(final.z) ** 2)
            assert np.all(r > 5.0)
        else:
            assert np.all(frac == 0.0)


def test_photoionization_decay_rate():
    """Force-free packets in sunlight decay as exp(-rate * t)."""
    rate = 1e-4
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(rate))
    n = 8
    # sunward side (y < 0): always out of shadow
    state0 = PacketState(
        t=jnp.full(n, 3000.0), x=jnp.zeros(n), y=jnp.full(n, -5.0),
        z=jnp.zeros(n), vx=jnp.zeros(n), vy=jnp.zeros(n), vz=jnp.zeros(n),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    nsteps = int(np.ceil(3000.0 / 30.0 + 1))
    final, _ = constant_step_driver(state0, spec, forces, None, 30.0, 1e30,
                                    RADIUS_KM, KEY, nsteps=nsteps,
                                    save_history=False)
    elapsed = 30.0 * (nsteps - 1)
    assert np.allclose(np.asarray(final.frac), math.exp(-rate * elapsed),
                       rtol=1e-10)
    assert np.allclose(np.asarray(final.lossfrac),
                       1 - math.exp(-rate * elapsed), rtol=1e-10)


def test_shadow_blocks_ionization_and_radpres():
    """Packets in the planet's shadow (rho < 1, y > 0) feel no photo loss and
    no radiation pressure (state.py:28-36,50-52)."""
    rate = 1e-3
    spec = EngineSpec(gravity=False, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(rate),
        rp_v0=jnp.asarray(-100.0), rp_dv=jnp.asarray(1.0),
        rp_accel=jnp.ones(201) * 1e-6)
    n = 4
    state0 = PacketState(
        t=jnp.full(n, 1000.0),
        x=jnp.zeros(n), y=jnp.full(n, 5.0), z=jnp.zeros(n),  # anti-sunward
        vx=jnp.zeros(n), vy=jnp.zeros(n), vz=jnp.zeros(n),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    nsteps = int(np.ceil(1000.0 / 50.0 + 1))
    final, _ = constant_step_driver(state0, spec, forces, None, 50.0, 1e30,
                                    RADIUS_KM, KEY, nsteps=nsteps,
                                    save_history=False)
    assert np.allclose(np.asarray(final.frac), 1.0)
    assert np.allclose(np.asarray(final.vy), 0.0)

    # same packets on the sunward side decay and accelerate along +y
    state_sun = state0._replace(y=jnp.full(n, -5.0))
    final_sun, _ = constant_step_driver(state_sun, spec, forces, None, 50.0,
                                        1e30, RADIUS_KM, KEY, nsteps=nsteps,
                                        save_history=False)
    elapsed = 50.0 * (nsteps - 1)
    assert np.allclose(np.asarray(final_sun.frac), math.exp(-rate * elapsed),
                       rtol=1e-9)
    assert np.allclose(np.asarray(final_sun.vy), 1e-6 * elapsed, rtol=1e-6)


def test_radpres_velocity_dependence():
    """The radiation-pressure lookup keys on vy + vrplanet."""
    spec = EngineSpec(gravity=False, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False)
    # accel table: a(v) = |v| * 1e-8 (distinguishable by radial velocity)
    grid_v0, grid_dv = -50.0, 0.5
    grid = grid_v0 + grid_dv * np.arange(201)
    forces = empty_force_table(jnp.float64)._replace(
        rp_v0=jnp.asarray(grid_v0), rp_dv=jnp.asarray(grid_dv),
        rp_accel=jnp.asarray(np.abs(grid) * 1e-8),
        vrplanet=jnp.asarray(10.0))
    # y far on the sunward side so the packet stays out of shadow all step
    state0 = PacketState(
        t=jnp.full(1, 100.0), x=jnp.zeros(1), y=jnp.full(1, -50.0),
        z=jnp.zeros(1), vx=jnp.zeros(1), vy=jnp.full(1, 5.0), vz=jnp.zeros(1),
        frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    stepped, _ = rk5_step(state0, jnp.asarray(1.0), spec, forces,
                          want_delta=False)
    # at vv = 15: accel = 1.5e-7
    assert np.isclose(float(stepped.vy[0]) - 5.0, 1.5e-7, rtol=1e-3)


def test_adaptive_matches_constant_step():
    state0 = make_state(n=64, vmin=3.0, vmax=6.0, endtime=5000.0)
    nsteps = int(np.ceil(5000.0 / 10.0 + 1))
    final_c, _ = constant_step_driver(
        state0, GRAVITY_SPEC, gravity_forces(), None, 10.0, 1e30, RADIUS_KM,
        KEY, nsteps=nsteps, save_history=False)
    final_a, iterations = adaptive_step_driver(
        state0, GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM,
        KEY)
    assert int(iterations) < 100000
    alive = (np.asarray(final_c.frac) > 0) & (np.asarray(final_a.frac) > 0)
    assert alive.sum() > 10
    # trajectories agree to the error tolerance (positions within ~1e-3 R_p)
    for comp in ('x', 'y', 'z'):
        c = np.asarray(getattr(final_c, comp))[alive]
        a = np.asarray(getattr(final_a, comp))[alive]
        assert np.max(np.abs(c - a)) < 1e-3
    # adaptive runs to t <= resolution
    assert np.all(np.asarray(final_a.t)[alive] <= 1e-6 + 1e-12)


def test_adaptive_energy_conservation():
    state0 = make_state(n=64, vmin=3.0, vmax=8.0, endtime=20000.0)
    final, _ = adaptive_step_driver(
        state0, GRAVITY_SPEC, gravity_forces(), None, 1e-7, 1e30, RADIUS_KM,
        KEY)
    alive = np.asarray(final.frac) > 0
    assert alive.sum() > 10
    e0 = energy(state0)[alive]
    e1 = energy(final)[alive]
    assert np.max(np.abs((e1 - e0) / e0)) < 1e-5


def test_outer_edge_kill():
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=True)
    forces = empty_force_table(jnp.float64)
    state0 = PacketState(
        t=jnp.full(1, 10000.0), x=jnp.zeros(1), y=jnp.full(1, -2.0),
        z=jnp.zeros(1), vx=jnp.zeros(1),
        vy=jnp.full(1, -10.0 / RADIUS_KM), vz=jnp.zeros(1),
        frac=jnp.ones(1), lossfrac=jnp.zeros(1))
    nsteps = int(np.ceil(10000.0 / 30.0 + 1))
    final, _ = constant_step_driver(state0, spec, forces, None, 30.0, 5.0,
                                    RADIUS_KM, KEY, nsteps=nsteps,
                                    save_history=False)
    assert float(final.frac[0]) == 0.0
    assert float(final.t[0]) == 0.0


def test_dense_lookup_matches_gather():
    """The TPU 'dense' hat-contraction lookup must reproduce the gather-based
    linear interpolation (and np.interp) everywhere, including the clamped
    ends and non-block-aligned lengths."""
    from nexoclom_tpu.ops.integrator import uniform_lookup
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.random(257))
    v0, dv = -12.0, 24.0 / 256
    values = jnp.asarray(np.concatenate([
        rng.uniform(-15, 15, 10001),     # interior + out-of-range
        [-12.0, 12.0, -20.0, 20.0]]))    # ends
    got_gather = np.asarray(uniform_lookup(table, v0, dv, values, 'gather'))
    got_dense = np.asarray(uniform_lookup(table, v0, dv, values, 'dense'))
    expect = np.interp(np.asarray(values), v0 + dv * np.arange(257),
                       np.asarray(table))
    assert np.allclose(got_gather, expect, rtol=1e-12, atol=1e-12)
    assert np.allclose(got_dense, expect, rtol=1e-9, atol=1e-12)


def test_driver_dense_lookup_matches_gather_driver():
    spec_g = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                        surface_bounce=False, check_outer_edge=False,
                        lookup_impl='gather')
    spec_d = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                        surface_bounce=False, check_outer_edge=False,
                        lookup_impl='dense')
    grid = np.linspace(-0.03, 0.03, 301)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM_MERCURY), ion_rate=jnp.asarray(1e-5),
        rp_v0=jnp.asarray(grid[0]), rp_dv=jnp.asarray(grid[1] - grid[0]),
        rp_accel=jnp.asarray(np.abs(np.sin(grid * 300)) * 1e-7))
    state0 = make_state(n=256, vmin=2.0, vmax=6.0, endtime=3000.0)
    nsteps = 101
    out_g, _ = constant_step_driver(state0, spec_g, forces, None, 30.0, 1e30,
                                    RADIUS_KM, KEY, nsteps=nsteps,
                                    save_history=False)
    out_d, _ = constant_step_driver(state0, spec_d, forces, None, 30.0, 1e30,
                                    RADIUS_KM, KEY, nsteps=nsteps,
                                    save_history=False)
    for leaf_g, leaf_d in zip(out_g, out_d):
        assert np.allclose(np.asarray(leaf_g), np.asarray(leaf_d),
                           rtol=1e-10, atol=1e-12)


def test_radpres_per_step_approximation():
    """The per-step radpres evaluation mode agrees with per-stage to the
    expected O(a'(v) dv_step) level over a full run."""
    grid = np.linspace(-0.03, 0.03, 301)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM_MERCURY), ion_rate=jnp.asarray(1e-5),
        rp_v0=jnp.asarray(grid[0]), rp_dv=jnp.asarray(grid[1] - grid[0]),
        rp_accel=jnp.asarray((1 + np.sin(grid * 500)) * 5e-8))
    state0 = make_state(n=128, vmin=2.0, vmax=6.0, endtime=5000.0)
    nsteps = 168
    outs = {}
    for per_stage in (True, False):
        spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                          surface_bounce=False, check_outer_edge=False,
                          radpres_per_stage=per_stage)
        out, _ = constant_step_driver(state0, spec, forces, None, 30.0, 1e30,
                                      RADIUS_KM, KEY, nsteps=nsteps,
                                      save_history=False)
        outs[per_stage] = out
    alive = (np.asarray(outs[True].frac) > 0) & \
        (np.asarray(outs[False].frac) > 0)
    assert alive.sum() > 20
    for comp in ('x', 'y', 'z'):
        exact = np.asarray(getattr(outs[True], comp))[alive]
        approx = np.asarray(getattr(outs[False], comp))[alive]
        diff = np.abs(exact - approx)
        # the frozen-lookup error accumulates as ~a'(v) (a h) t^2/2; for
        # this adversarial table (100% variation per 30 km/s) that is a few
        # 1e-4 R_p after 5000 s -- far below image-bin scales (>=0.01 R_p)
        assert np.median(diff) < 1e-3 and np.max(diff) < 5e-3   # R_p


def test_adaptive_vs_constant_with_radpres():
    """With radiation pressure + photo loss active, the adaptive and
    constant-step drivers must agree trajectory-wise at tight tolerance
    (the cross-driver consistency check SURVEY section 7.2 step 5 calls
    for)."""
    grid = np.linspace(-0.03, 0.03, 301)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(GM_MERCURY), ion_rate=jnp.asarray(5e-5),
        vrplanet=jnp.asarray(9.7 / RADIUS_KM),
        rp_v0=jnp.asarray(grid[0]), rp_dv=jnp.asarray(grid[1] - grid[0]),
        rp_accel=jnp.asarray((1 + np.cos(grid * 200)) * 5e-8))
    spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False)
    state0 = make_state(n=48, vmin=3.0, vmax=6.0, endtime=4000.0)
    nsteps = int(np.ceil(4000.0 / 5.0 + 1))
    final_c, _ = constant_step_driver(state0, spec, forces, None, 5.0, 1e30,
                                      RADIUS_KM, KEY, nsteps=nsteps,
                                      save_history=False)
    final_a, _ = adaptive_step_driver(state0, spec, forces, None, 1e-6, 1e30,
                                      RADIUS_KM, KEY)
    alive = (np.asarray(final_c.frac) > 0) & (np.asarray(final_a.frac) > 0)
    assert alive.sum() > 10
    for comp in ('x', 'y', 'z'):
        diff = np.abs(np.asarray(getattr(final_c, comp))[alive] -
                      np.asarray(getattr(final_a, comp))[alive])
        assert np.max(diff) < 2e-3
    frac_diff = np.abs(np.asarray(final_c.frac)[alive] -
                       np.asarray(final_a.frac)[alive])
    assert np.max(frac_diff) < 1e-4


def test_adaptive_compacting_matches_monolithic():
    """Segmented + compacted adaptive run reproduces the monolithic driver
    exactly for deterministic physics (no bounce RNG), in original packet
    order, including step-size carry-over across segments."""
    from nexoclom_tpu.ops.integrator import adaptive_compacting_run
    state0 = make_state(n=96, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, iters_m = adaptive_step_driver(state0, *args)
    final_c, iters_c = adaptive_compacting_run(
        state0, *args, segment=64, compact_threshold=0.9, min_batch=16)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_allclose(np.asarray(getattr(final_c, f)),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)
    # segmentation can only overrun the monolithic count by < one segment
    assert iters_c >= int(iters_m)
    assert iters_c < int(iters_m) + 64


def test_adaptive_return_h_and_array_initial_step():
    """return_h exposes per-packet step sizes; feeding them back with
    max_iterations splitting reproduces the single-run result."""
    state0 = make_state(n=32, vmin=2.0, vmax=5.0, endtime=3000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_1, it1 = adaptive_step_driver(state0, *args)
    mid, itm, h_mid = adaptive_step_driver(state0, *args,
                                           max_iterations=50, return_h=True)
    final_2, it2 = adaptive_step_driver(mid, *args, initial_step=h_mid)
    for f in ('x', 'y', 'z', 'frac'):
        np.testing.assert_allclose(np.asarray(getattr(final_2, f)),
                                   np.asarray(getattr(final_1, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)


def test_baked_adaptive_matches_plain():
    """adaptive_step_driver_baked (tables as compile-time constants — 4x
    on the TPU while loop) is bit-identical to the argument-passing
    driver, and its compile cache keys on table CONTENTS."""
    from nexoclom_tpu.ops.integrator import (adaptive_step_driver,
                                             adaptive_step_driver_baked,
                                             _BAKED_ADAPTIVE_CACHE)
    state0 = make_state(n=64, vmin=2.0, vmax=6.0, endtime=2000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, jnp.asarray(1e-4),
            jnp.asarray(1e30), jnp.asarray(RADIUS_KM), KEY)
    plain, it_p = adaptive_step_driver(state0, *args)
    baked, it_b = adaptive_step_driver_baked(state0, *args)
    assert int(it_p) == int(it_b)
    for leaf_p, leaf_b in zip(plain, baked):
        np.testing.assert_array_equal(np.asarray(leaf_p),
                                      np.asarray(leaf_b))
    # same physics -> cache hit; different GM -> new entry (guard the
    # growth assertions against the FIFO cap: earlier adaptive runs in
    # this process may already fill the cache)
    from nexoclom_tpu.ops.integrator import _BAKED_ADAPTIVE_CACHE_MAX
    n_entries = len(_BAKED_ADAPTIVE_CACHE)
    adaptive_step_driver_baked(state0, *args)
    assert len(_BAKED_ADAPTIVE_CACHE) == n_entries
    other = (GRAVITY_SPEC,
             gravity_forces()._replace(gm=jnp.asarray(GM_MERCURY * 1.1)),
             None, jnp.asarray(1e-4), jnp.asarray(1e30),
             jnp.asarray(RADIUS_KM), KEY)
    adaptive_step_driver_baked(state0, *other)
    if n_entries < _BAKED_ADAPTIVE_CACHE_MAX:
        assert len(_BAKED_ADAPTIVE_CACHE) == n_entries + 1


def test_adaptive_chunked_matches_monolithic():
    """adaptive_step_driver_chunked splits batches above the lane envelope
    into sequential sub-batches (tail padded with dead lanes so every
    sub-batch shares one executable) and reproduces the monolithic result
    exactly for deterministic physics; within-envelope batches pass
    straight through."""
    from nexoclom_tpu.ops.integrator import (ADAPTIVE_LANE_ENVELOPE,
                                             adaptive_step_driver_chunked)
    assert ADAPTIVE_LANE_ENVELOPE == 1 << 21   # the validated envelope
    state0 = make_state(n=100, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, iters_m = adaptive_step_driver(state0, *args)
    # envelope 32 -> 4 sub-batches, the last padded 100 -> 3x32 + 4(+28 pad)
    final_c, iters_c = adaptive_step_driver_chunked(state0, *args,
                                                    envelope=32)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_allclose(np.asarray(getattr(final_c, f)),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)
    # iterations is the max over sub-batches <= the monolithic count
    # (the monolithic loop runs until ITS slowest lane finishes)
    assert 0 < int(iters_c) <= int(iters_m)
    # within-envelope: identical to the baked driver (pass-through)
    from nexoclom_tpu.ops.integrator import adaptive_step_driver_baked
    f_pass, it_pass = adaptive_step_driver_chunked(state0, *args,
                                                   envelope=128)
    f_baked, it_baked = adaptive_step_driver_baked(state0, *args)
    assert int(it_pass) == int(it_baked)
    for leaf_p, leaf_b in zip(f_pass, f_baked):
        np.testing.assert_array_equal(np.asarray(leaf_p), np.asarray(leaf_b))
    # unsupported kwargs above the envelope are refused loudly
    with pytest.raises(ValueError, match='collect_stats'):
        adaptive_step_driver_chunked(state0, *args, envelope=32,
                                     collect_stats=True)


def test_output_chunks_oversized_adaptive_batch(monkeypatch, tmp_path):
    """An adaptive Output above the validated lane envelope auto-splits
    into sequential sub-batches (the 4M-lane chip-fault guard), producing
    per-packet results identical to the in-envelope run."""
    import nexoclom_tpu.ops.integrator as integ
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking import Output
    import os as _os
    infile = _os.path.join(_os.path.dirname(__file__), 'data', 'inputfiles',
                           'mercury_gravity.input')
    inp = Input(infile)
    inp.options.endtime = 2000.0
    inp.options.step_size = 0.0
    inp.options.resolution = 1e-4
    out_full = Output(inp, 100, seed=5)
    x_full = out_full.X.sort_values('x').reset_index(drop=True)

    calls = {}

    def spy(state0, spec, forces, surface, *args, orchestrator='auto',
            inner_steps=4, **kwargs):
        calls['envelope'] = 32
        calls['orchestrator'] = orchestrator
        return integ.adaptive_step_driver_chunked(
            state0, spec, forces, surface, *args, envelope=32,
            inner_steps=inner_steps)

    import nexoclom_tpu.particle_tracking.output as out_mod
    monkeypatch.setattr(out_mod, 'adaptive_production_run', spy)
    out_chunked = Output(inp, 100, seed=5)
    assert calls['envelope'] == 32        # the spy actually forced chunking
    x_chunked = out_chunked.X.sort_values('x').reset_index(drop=True)
    for col in ('time', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac'):
        np.testing.assert_allclose(x_chunked[col].to_numpy(),
                                   x_full[col].to_numpy(),
                                   rtol=1e-12, atol=1e-12, err_msg=col)


def test_adaptive_pool_run_matches_monolithic():
    """The pool-refill orchestrator (device-side sort compaction + fixed
    batch width) reproduces the monolithic driver per packet, in original
    order, across refills, pool exhaustion, filler padding, and the final
    straggler drain."""
    from nexoclom_tpu.ops.integrator import adaptive_pool_run
    state0 = make_state(n=200, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, iters_m = adaptive_step_driver(state0, *args)
    # batch 64 -> refill chunk 32: the 200-packet pool forces 4+ refills,
    # a non-multiple tail (200 = 64 + 4x32 + 8 left), and filler lanes
    final_p, iters_p = adaptive_pool_run(state0, *args, batch=64,
                                         segment=48)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_allclose(np.asarray(getattr(final_p, f)),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)
    assert iters_p > 0
    # small pools fall through to the plain baked driver
    small = jax.tree.map(lambda leaf: leaf[:32], state0)
    final_s, _ = adaptive_pool_run(small, *args, batch=64)
    final_sm, _ = adaptive_step_driver(small, *args)
    for leaf_s, leaf_m in zip(final_s, final_sm):
        np.testing.assert_array_equal(np.asarray(leaf_s), np.asarray(leaf_m))


def test_adaptive_pool_loop_matches_monolithic():
    """The in-loop pool-refill driver (refill via lax.cond INSIDE the
    while_loop — one dispatch, zero host orchestration) reproduces the
    monolithic driver per packet in original order, including the bounce
    RNG stream (keys fold on the global iteration counter)."""
    from nexoclom_tpu.ops.integrator import adaptive_pool_loop
    state0 = make_state(n=200, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, iters_m = adaptive_step_driver(state0, *args)
    for inner in (1, 4):
        final_p, iters_p = adaptive_pool_loop(state0, *args, batch=64,
                                              swap_every=16,
                                              inner_steps=inner)
        for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
            np.testing.assert_allclose(np.asarray(getattr(final_p, f)),
                                       np.asarray(getattr(final_m, f)),
                                       rtol=1e-12, atol=1e-12, err_msg=f)
        assert iters_p > 0
    # quarter-batch refill quantum exercises multiple swaps + fillers
    final_q, _ = adaptive_pool_loop(state0, *args, batch=64, swap_every=16,
                                    refill_fraction=0.25)
    for f in ('x', 'frac'):
        np.testing.assert_allclose(np.asarray(getattr(final_q, f)),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)
    # grouped swap sorts (several payloads per sort op, shared stable
    # key): identical permutation, bit-identical results — 11 leaves
    # with group 4 exercises a ragged final group
    for grp in (3, 4):
        final_g, _ = adaptive_pool_loop(state0, *args, batch=64,
                                        swap_every=16, refill_fraction=0.25,
                                        sort_group=grp)
        for f in ('t', 'x', 'frac', 'lossfrac'):
            np.testing.assert_array_equal(np.asarray(getattr(final_g, f)),
                                          np.asarray(getattr(final_q, f)),
                                          err_msg=f'group {grp} {f}')
    # small pools fall through to the plain baked driver
    small = jax.tree.map(lambda leaf: leaf[:32], state0)
    final_s, _ = adaptive_pool_loop(small, *args, batch=64)
    final_sm, _ = adaptive_step_driver(small, *args)
    for leaf_s, leaf_m in zip(final_s, final_sm):
        np.testing.assert_array_equal(np.asarray(leaf_s), np.asarray(leaf_m))


def test_adaptive_pool_loop_baked_key_bit_exact():
    """``bake_key=True`` (RNG key as a compile-time constant, one
    executable per seed) is pure compilation strategy: results must be
    bit-identical to the argument-passing pool loop."""
    from nexoclom_tpu.ops.integrator import adaptive_pool_loop
    state0 = make_state(n=200, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_a, iters_a = adaptive_pool_loop(state0, *args, batch=64,
                                          swap_every=16)
    final_b, iters_b = adaptive_pool_loop(state0, *args, batch=64,
                                          swap_every=16, bake_key=True)
    assert int(iters_a) == int(iters_b)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_array_equal(np.asarray(getattr(final_b, f)),
                                      np.asarray(getattr(final_a, f)),
                                      err_msg=f)


def test_adaptive_pool_loop_always_boundary_matches():
    """``_boundary='always'`` (unconditional sort + select-gated swap —
    no lax.cond crossing the carry) reproduces the monolithic driver per
    packet for deterministic physics, across refills, pool exhaustion,
    and boundaries where the swap predicate is false (too few finished
    lanes: the select must keep the batch intact and the stale retire
    write must be overwritten downstream)."""
    from nexoclom_tpu.ops.integrator import adaptive_pool_loop
    state0 = make_state(n=200, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, _ = adaptive_step_driver(state0, *args)
    for swap_every, frac in ((16, 0.0625), (16, 0.25), (4, 0.5)):
        final_a, iters_a = adaptive_pool_loop(
            state0, *args, batch=64, swap_every=swap_every,
            refill_fraction=frac, _boundary='always')
        assert iters_a > 0
        for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac',
                  'lossfrac'):
            np.testing.assert_allclose(
                np.asarray(getattr(final_a, f)),
                np.asarray(getattr(final_m, f)), rtol=1e-12, atol=1e-12,
                err_msg=f'{swap_every}:{frac} {f}')


def test_adaptive_pool_loop_full_physics_f32_bit_exact():
    """Pool loop vs BAKED monolithic on full Ca physics (gravity +
    radpres lookup + shadow photoionization + surface kill + outer
    edge) in float32 — the production dtype.  The reference frame is
    ``adaptive_step_driver_baked``: the argument-passing driver
    compiles the radpres lookup slightly differently once the tables
    are constant-folded (f32 ULP-level, amplified to visible values by
    grazing trajectories — docs/scaling.md platform notes), so only
    baked-vs-pool is a bit-exactness statement."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    from nexoclom_tpu.initial_state.sections import effective_taa
    from nexoclom_tpu.ops.integrator import (adaptive_pool_loop,
                                             adaptive_step_driver_baked,
                                             packet_state_from_dict)
    from nexoclom_tpu.particle_tracking.output import (
        build_force_table, build_surface_table, engine_spec_from_inputs)
    from nexoclom_tpu.solarsystem import planet_dist

    here = os.path.dirname(os.path.abspath(__file__))
    inp = Input(os.path.join(here, 'data', 'inputfiles',
                             'mercury_ca_spot.input'))
    inp.options.endtime = 2000.0
    inp.options.step_size = 0.0
    dtype = jnp.float32
    rkm = inp.geometry.planet.radius
    r, v_r = planet_dist(inp.geometry.planet, effective_taa(inp.geometry))
    spec = engine_spec_from_inputs(inp)
    forces = build_force_table(inp, r, v_r / rkm, rkm, dtype)
    surface = build_surface_table(inp, spec, rkm, dtype)
    state0 = packet_state_from_dict(
        build_initial_state(inp, 200, seed=11, dtype=dtype))
    args = (spec, forces, surface, jnp.asarray(1e-6, dtype),
            jnp.asarray(30.0, dtype), jnp.asarray(rkm, dtype),
            jax.random.PRNGKey(5))
    final_b, _ = adaptive_step_driver_baked(state0, *args,
                                            max_iterations=400000)
    final_p, _ = adaptive_pool_loop(state0, *args, batch=64, swap_every=16,
                                    refill_fraction=0.25, inner_steps=4)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_array_equal(np.asarray(getattr(final_p, f)),
                                      np.asarray(getattr(final_b, f)),
                                      err_msg=f)


def test_adaptive_pool_loop_satellite_bit_exact():
    """Pool loop vs baked monolithic on a SATELLITE source (Io): moon
    gravity/shadow/re-impact are functions of each packet's own time, so
    the swap reshuffles must leave the time-dependent moon physics
    bit-identical — the per-lane t rides through the sorts with the rest
    of the state."""
    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.initial_state.sampling import build_initial_state
    from nexoclom_tpu.initial_state.sections import effective_taa
    from nexoclom_tpu.ops.integrator import (adaptive_pool_loop,
                                             adaptive_step_driver_baked,
                                             packet_state_from_dict)
    from nexoclom_tpu.particle_tracking.output import (
        build_force_table, build_surface_table, engine_spec_from_inputs)
    from nexoclom_tpu.solarsystem import planet_dist

    here = os.path.dirname(os.path.abspath(__file__))
    inp = Input(os.path.join(here, 'data', 'inputfiles',
                             'jupiter_io_satellite.input'))
    inp.options.endtime = 2000.0
    inp.options.step_size = 0.0
    dtype = jnp.float32
    rkm = inp.geometry.planet.radius
    r, v_r = planet_dist(inp.geometry.planet, effective_taa(inp.geometry))
    spec = engine_spec_from_inputs(inp)
    assert spec.moon_gravity or spec.moon_kill   # the moon physics is on
    forces = build_force_table(inp, r, v_r / rkm, rkm, dtype)
    surface = build_surface_table(inp, spec, rkm, dtype)
    state0 = packet_state_from_dict(
        build_initial_state(inp, 200, seed=13, dtype=dtype))
    args = (spec, forces, surface, jnp.asarray(1e-6, dtype),
            jnp.asarray(30.0, dtype), jnp.asarray(rkm, dtype),
            jax.random.PRNGKey(7))
    final_b, _ = adaptive_step_driver_baked(state0, *args,
                                            max_iterations=400000)
    final_p, _ = adaptive_pool_loop(state0, *args, batch=64, swap_every=16,
                                    refill_fraction=0.25, inner_steps=4)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_array_equal(np.asarray(getattr(final_p, f)),
                                      np.asarray(getattr(final_b, f)),
                                      err_msg=f)


def test_adaptive_production_run_routing():
    """The production router picks chunked below the pool amortisation
    point and the in-loop pool above it (or on request), with identical
    physics either way (deterministic spec)."""
    from nexoclom_tpu.ops.integrator import adaptive_production_run
    state0 = make_state(n=200, vmin=2.0, vmax=6.0, endtime=5000.0)
    args = (GRAVITY_SPEC, gravity_forces(), None, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, _ = adaptive_step_driver(state0, *args)

    # auto, n far below pool_min -> chunked path (device arrays)
    final_a, _ = adaptive_production_run(state0, *args)
    for f in ('t', 'x', 'frac', 'lossfrac'):
        np.testing.assert_allclose(np.asarray(getattr(final_a, f)),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)

    # forced pool with small knobs -> numpy state in original order
    final_p, _ = adaptive_production_run(state0, *args, orchestrator='pool',
                                         batch=64, swap_every=16,
                                         inner_steps=1)
    assert isinstance(final_p.x, np.ndarray)
    for f in ('t', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'lossfrac'):
        np.testing.assert_allclose(getattr(final_p, f),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)

    # auto above a lowered pool_min routes to the pool; a lowered
    # pool_chunk exercises the sequential multi-pool path
    final_c, _ = adaptive_production_run(state0, *args, orchestrator='auto',
                                         pool_min=128, pool_chunk=96,
                                         batch=64, swap_every=16,
                                         inner_steps=1)
    assert isinstance(final_c.x, np.ndarray)
    for f in ('t', 'x', 'frac'):
        np.testing.assert_allclose(getattr(final_c, f),
                                   np.asarray(getattr(final_m, f)),
                                   rtol=1e-12, atol=1e-12, err_msg=f)

    with pytest.raises(ValueError, match='orchestrator'):
        adaptive_production_run(state0, *args, orchestrator='segmented')


def test_adaptive_pool_loop_bounce_rng_identical():
    """With surface bounce active the in-loop pool driver cannot match
    bitwise (bounce randomness is consumed per lane POSITION and swaps
    reshuffle positions — both streams equally valid), but it must agree
    distributionally: same bounce survivor statistics within MC noise."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.integrator import (SurfaceTable,
                                             adaptive_pool_loop)
    spec = EngineSpec(gravity=True, radpres=False, constant_rate=False,
                      surface_bounce=True, check_outer_edge=False)
    surface = SurfaceTable(stickcoef=jnp.asarray(0.4),
                           accomfactor=jnp.asarray(0.0),
                           stick_A=jnp.asarray([0.0, 0.0, 0.0]),
                           taa=jnp.asarray(0.0),
                           v_table=jnp.asarray(np.zeros((2, 2))),
                           temp0=jnp.asarray(0.0), dtemp=jnp.asarray(1.0))
    forces = gravity_forces()._replace(ion_rate=jnp.asarray(2e-5))
    # sub-escape launches so a good share of the pool re-impacts+bounces
    state0 = make_state(n=160, vmin=1.5, vmax=3.5, endtime=4000.0)
    args = (spec, forces, surface, 1e-6, 1e30, RADIUS_KM, KEY)
    final_m, _ = adaptive_step_driver(state0, *args)
    final_p, _ = adaptive_pool_loop(state0, *args, batch=64, swap_every=16,
                                    refill_fraction=0.25, inner_steps=4)
    fm = np.asarray(final_m.frac)
    fp = np.asarray(final_p.frac)
    assert np.sum(fm < 1.0) > 10      # the scenario actually exercises bounce
    # sticking statistics: the same number of packets face the same
    # per-impact stick probability; totals agree within binomial noise
    dead_m, dead_p = np.sum(fm == 0.0), np.sum(fp == 0.0)
    sigma = np.sqrt(max(dead_m, 1.0))
    assert abs(dead_m - dead_p) <= 5 * sigma
    assert abs(fm.sum() - fp.sum()) / fm.sum() < 0.2
