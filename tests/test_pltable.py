"""Compressed piecewise-linear table (ops/pltable.py): exactness at tol=0,
error bounds on the real radpres/g-value curves, np.interp end clamping,
and engine-level equivalence of the 'relu' lookup strategy."""
import numpy as np
import pytest

import jax.numpy as jnp

from nexoclom_tpu.atomicdata import gvalue_table, radpres_table
from nexoclom_tpu.ops.pltable import compress_uniform, pl_lookup

pytestmark = pytest.mark.ops


def _grid(v0, dv, n):
    return v0 + dv * np.arange(n)


def test_tol_zero_is_exact_piecewise_linear():
    rng = np.random.default_rng(3)
    values = rng.normal(size=57)
    v0, dv = -2.0, 0.25
    pl = compress_uniform(v0, dv, values, rel_tol=0.0)
    assert pl.knots.shape[0] == 56      # keeps every grid point
    v = rng.uniform(v0 - 1, v0 + dv * 60, 4096)
    expect = np.interp(v, _grid(v0, dv, 57), values)
    got = np.asarray(pl_lookup(pl, jnp.asarray(v)))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


@pytest.mark.parametrize('species', ['Ca', 'Na', 'Mg'])
def test_radpres_compression_error_bound(species):
    v0, dv, accel = radpres_table(species, 0.352)
    pl = compress_uniform(v0, dv, accel, rel_tol=1e-3)
    # big compression on the real curves
    assert pl.knots.shape[0] < len(accel) // 3
    v = np.random.default_rng(0).uniform(v0, v0 + dv * len(accel), 100000)
    expect = np.interp(v, _grid(v0, dv, len(accel)), accel)
    got = np.asarray(pl_lookup(pl, jnp.asarray(v)))
    assert np.max(np.abs(got - expect)) <= 1e-3 * np.max(np.abs(accel)) * 1.01


def test_gvalue_compression_error_bound():
    g_v0, g_dv, g_tab = gvalue_table('Na', [5891.0, 5897.0], 0.352)
    pl = compress_uniform(g_v0, g_dv, g_tab, rel_tol=1e-3)
    v = np.random.default_rng(1).uniform(g_v0, g_v0 + g_dv * len(g_tab),
                                         50000)
    expect = np.interp(v, _grid(g_v0, g_dv, len(g_tab)), g_tab)
    got = np.asarray(pl_lookup(pl, jnp.asarray(v)))
    assert np.max(np.abs(got - expect)) <= 1e-3 * np.max(np.abs(g_tab)) * 1.01


def test_end_clamping_matches_np_interp():
    values = np.array([2.0, 5.0, 3.0, 7.0])
    pl = compress_uniform(0.0, 1.0, values, rel_tol=0.0)
    v = jnp.asarray([-10.0, -0.001, 3.0001, 100.0])
    got = np.asarray(pl_lookup(pl, v))
    np.testing.assert_allclose(got, [2.0, 2.0, 7.0, 7.0], atol=1e-12)


def test_lookup_with_slope_value_and_derivative():
    """pl_lookup_with_slope returns the same values as pl_lookup and the
    exact right-derivative of the piecewise-linear interpolant (segment
    slope; 0 below the first knot, last-segment slope at the clamp top)."""
    from nexoclom_tpu.ops.pltable import pl_lookup_with_slope
    rng = np.random.default_rng(7)
    values = rng.normal(size=41)
    v0, dv = -3.0, 0.5
    pl = compress_uniform(v0, dv, values, rel_tol=0.0)
    # probe strictly inside segments (off-knot): slope = segment slope
    v = rng.uniform(v0 - 2, v0 + dv * 44, 20000)
    f, s, vc = pl_lookup_with_slope(pl, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(f),
                               np.asarray(pl_lookup(pl, jnp.asarray(v))),
                               rtol=0, atol=1e-12)
    grid = _grid(v0, dv, 41)
    seg_slopes = np.diff(values) / dv
    vcn = np.asarray(vc)
    idx = np.clip(np.floor((vcn - v0) / dv).astype(int), 0, 39)
    expect_s = seg_slopes[idx]
    # below the first knot the interpolant is clamped flat
    expect_s[v <= v0] = 0.0
    on_knot = np.isclose((vcn - v0) / dv, np.round((vcn - v0) / dv))
    np.testing.assert_allclose(np.asarray(s)[~on_knot], expect_s[~on_knot],
                               rtol=1e-10, atol=1e-12)


def test_tangent_stage_mode_inside_compression_envelope():
    """Engine driver with radpres_per_stage='tangent' (one shared knot walk
    + per-stage first-order reconstruction) stays far inside the accepted
    relu-compression envelope on the real Ca problem: stage-velocity
    spreads are O(h a), well below the compressed knot spacing, so the
    reconstruction is exact except at knot crossings."""
    import jax
    from nexoclom_tpu.ops.integrator import (EngineSpec, empty_force_table,
                                             constant_step_driver)
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source

    radius_km = 2440.53
    v0, dv, accel = radpres_table('Ca', 0.352)
    pl = compress_uniform(v0 / radius_km, dv / radius_km, accel / radius_km,
                          rel_tol=1e-3)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(-1.516e-6), vrplanet=jnp.asarray(0.0),
        rp_v0=jnp.asarray(v0 / radius_km), rp_dv=jnp.asarray(dv / radius_km),
        rp_accel=jnp.asarray(accel / radius_km), rp_pl=pl,
        ion_rate=jnp.asarray(1e-4))
    state0 = sample_uniform_flat_source(
        jax.random.PRNGKey(11), 4096, vprob=2.5 / radius_km,
        delv=1.5 / radius_km, endtime=7200.0, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    outs = {}
    for mode in (True, 'tangent'):
        spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                          surface_bounce=False, check_outer_edge=True,
                          lookup_impl='relu', radpres_per_stage=mode)
        outs[mode], _ = constant_step_driver(
            state0, spec, forces, None, jnp.asarray(30.0, jnp.float64),
            jnp.asarray(15.0, jnp.float64), jnp.asarray(radius_km),
            key, nsteps=241, save_history=False)
    d = np.sqrt(sum(np.asarray(getattr(outs['tangent'], c) -
                               getattr(outs[True], c)) ** 2
                    for c in ('x', 'y', 'z')))
    # measured on this problem: p99 ~ 2e-4 R_p vs compression-envelope
    # p99 ~ 3.5e-2 R_p (200x margin); total frac to 1e-4 relative
    assert np.percentile(d, 99) < 3e-3
    tot_e = float(np.sum(np.asarray(outs[True].frac)))
    tot_t = float(np.sum(np.asarray(outs['tangent'].frac)))
    assert abs(tot_t - tot_e) / tot_e < 1e-4


def test_relu_lookup_matches_gather_in_engine():
    """A full RK5 step with lookup_impl='relu' (tol-compressed table) tracks
    the exact-gather step to within the compression tolerance."""
    import jax
    from nexoclom_tpu.ops.integrator import (EngineSpec, empty_force_table,
                                             rk5_step)
    from nexoclom_tpu.parallel.ensemble import sample_uniform_flat_source

    radius_km = 2440.53
    v0, dv, accel = radpres_table('Na', 0.352)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(-6.6743e-11 * 3.30103e23 / (radius_km * 1e3) ** 3),
        vrplanet=jnp.asarray(9.69 / radius_km),
        rp_v0=jnp.asarray(v0 / radius_km),
        rp_dv=jnp.asarray(dv / radius_km),
        rp_accel=jnp.asarray(accel / radius_km),
        rp_pl=compress_uniform(v0 / radius_km, dv / radius_km,
                               accel / radius_km, rel_tol=1e-3),
        ion_rate=jnp.asarray(6.7e-5))
    state = sample_uniform_flat_source(
        jax.random.PRNGKey(5), 2048, vprob=3.0 / radius_km,
        delv=2.0 / radius_km, endtime=3600.0, dtype=jnp.float64)
    h = jnp.full((2048,), 30.0, jnp.float64)

    outs = {}
    for impl in ('gather', 'relu'):
        spec = EngineSpec(gravity=True, radpres=True, constant_rate=False,
                          surface_bounce=False, check_outer_edge=False,
                          lookup_impl=impl)
        outs[impl], _ = rk5_step(state, h, spec, forces, want_delta=False)

    # radpres accel error <= 1e-3 * max_accel; over one 30 s step the
    # velocity deviation is bounded by h * that
    dv_bound = 30.0 * 1e-3 * float(np.max(accel)) / radius_km
    for name in ('vx', 'vy', 'vz'):
        delta = np.abs(np.asarray(getattr(outs['relu'], name)) -
                       np.asarray(getattr(outs['gather'], name)))
        assert np.max(delta) <= dv_bound * 1.05
    np.testing.assert_allclose(np.asarray(outs['relu'].frac),
                               np.asarray(outs['gather'].frac), rtol=1e-12)


def test_relu_spec_without_compressed_table_falls_back():
    """A ForceTable built the pre-compression way (rp_accel only, rp_pl
    left as the placeholder) must NOT produce silent a(v)=0 under the TPU
    default lookup_impl='relu' — it falls back to the dense lookup."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.integrator import (EngineSpec, empty_force_table,
                                             radpres_lookup)
    grid = np.linspace(-10.0, 10.0, 41)
    accel = np.exp(-(grid / 4.0) ** 2)
    forces = empty_force_table(jnp.float64)._replace(
        rp_v0=jnp.asarray(grid[0]), rp_dv=jnp.asarray(grid[1] - grid[0]),
        rp_accel=jnp.asarray(accel))
    vv = jnp.asarray(np.linspace(-12, 12, 100))
    got = np.asarray(radpres_lookup(
        EngineSpec(lookup_impl='relu'), forces, vv))
    want = np.interp(np.asarray(vv), grid, accel)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert got.max() > 0.5
