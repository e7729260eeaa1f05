"""Compressed piecewise-linear tables evaluated as relu expansions.

The radiation-pressure curve a(v) and the g-value curves g(v) are smooth
1-D functions tabulated on fine uniform grids (512-828 points — see
``atomicdata/g_values.py``; reference semantics ``state.py:35-36`` =
``np.interp`` with end clamping).  On this TPU both XLA gather and the
dense hat-matrix contraction pay per *table point*: gather lowers to a
scalar loop (~19.6 ms per 1M lookups) and the hat form costs
O(N x K) vector ops (~1.7 ms per 1M at K=241).

A piecewise-linear function with knots t_0 < ... < t_m is exactly

    f(v) = y_0 + sum_j ds_j * relu(min(max(v, t_0), t_m) - t_j)

where ds_j are the slope *changes* at each knot (ds_0 = first slope).
Clamping v to [t_0, t_m] reproduces np.interp's end-value extension.
Evaluation is pure subtract/max/fma — no gather, no data movement — and
costs O(N x m).  Because the curves are smooth, Douglas-Peucker thinning
reduces m to ~30-80 knots at 0.1% max error (measured per species in
tests/test_pltable.py), a ~10-20x op-count reduction over the dense form
with an error far below Monte Carlo noise.  ``tol=0`` keeps every grid
point and is bit-exact piecewise-linear interpolation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PLTable(NamedTuple):
    """Compressed piecewise-linear table (device pytree)."""
    knots: jnp.ndarray   # (m,) knot locations, ascending
    dslope: jnp.ndarray  # (m,) slope change at each knot (first = slope 0)
    base: jnp.ndarray    # scalar, f(knots[0])


def _douglas_peucker(x: np.ndarray, y: np.ndarray, tol: float) -> np.ndarray:
    """Indices of a subset of points whose linear interpolant deviates from
    (x, y) by at most ``tol`` (max-abs, measured at the input points)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        seg_x = x[i0:i1 + 1]
        seg_y = y[i0:i1 + 1]
        line = y[i0] + (seg_x - x[i0]) * ((y[i1] - y[i0]) / (x[i1] - x[i0]))
        dev = np.abs(seg_y - line)
        k = int(np.argmax(dev))
        if dev[k] > tol:
            keep[i0 + k] = True
            stack.append((i0, i0 + k))
            stack.append((i0 + k, i1))
    return np.nonzero(keep)[0]


def compress_points(grid: np.ndarray, values: np.ndarray,
                    rel_tol: float = 1e-3, dtype=np.float64) -> PLTable:
    """Compress tabulated (grid, values) points — any strictly increasing
    grid — to a PLTable whose interpolant deviates from the original
    piecewise-linear interpolant by at most ``rel_tol * max|values|``
    (host-side, numpy)."""
    grid = np.asarray(grid, np.float64)
    values = np.asarray(values, np.float64)
    if grid.ndim != 1 or grid.shape != values.shape or len(grid) < 2:
        raise ValueError('compress_points needs matching 1-D grid/values '
                         'with at least 2 points')
    if not np.all(np.diff(grid) > 0):
        raise ValueError('compress_points grid must be strictly increasing')
    if rel_tol > 0:
        tol = rel_tol * float(np.max(np.abs(values)))
        idx = _douglas_peucker(grid, values, tol)
    else:
        idx = np.arange(len(values))
    t = grid[idx]
    y = values[idx]
    slopes = np.diff(y) / np.diff(t)
    dslope = np.concatenate([slopes[:1], np.diff(slopes)])
    return PLTable(knots=jnp.asarray(t[:-1], dtype),
                   dslope=jnp.asarray(dslope, dtype),
                   base=jnp.asarray(np.array([y[0], t[-1]]), dtype))


def compress_uniform(v0: float, dv: float, values: np.ndarray,
                     rel_tol: float = 1e-3, dtype=np.float64) -> PLTable:
    """Compress a uniform-grid table to a PLTable whose interpolant deviates
    from the original piecewise-linear interpolant by at most
    ``rel_tol * max|values|`` (host-side, numpy)."""
    values = np.asarray(values, np.float64)
    grid = v0 + dv * np.arange(len(values))
    return compress_points(grid, values, rel_tol=rel_tol, dtype=dtype)


def pad_pltable(pl: PLTable, m: int) -> PLTable:
    """Pad a PLTable to ``m`` knots with zero-slope-change knots repeated
    at the last knot location — the interpolant is IDENTICAL (a relu term
    with dslope 0 contributes exact 0 everywhere).  Ensemble stacking
    (``parallel.ensemble.stack_force_tables``) requires equal knot counts
    across members; different species compress to different counts."""
    k = pl.knots.shape[0]
    if k > m:
        raise ValueError(f'PLTable has {k} knots > requested pad {m}')
    if k == m:
        return pl
    pad = m - k
    return pl._replace(
        knots=jnp.concatenate(
            [pl.knots, jnp.full(pad, pl.knots[-1], pl.knots.dtype)]),
        dslope=jnp.concatenate(
            [pl.dslope, jnp.zeros(pad, pl.dslope.dtype)]))


def empty_pltable(dtype=jnp.float64) -> PLTable:
    """Placeholder for specs that don't use the relu lookup (f == 0)."""
    return PLTable(knots=jnp.zeros((1,), dtype),
                   dslope=jnp.zeros((1,), dtype),
                   base=jnp.asarray(np.array([0.0, 1.0]), dtype))


def pl_lookup_with_slope(pl: PLTable, value):
    """Evaluate ``(f(v), f'(v), clip(v))`` in ONE shared loop over the knots.

    The slope is the right-derivative of the piecewise-linear interpolant at
    the *clamped* argument (0 below the first knot, the last segment's slope
    at/above the clamp ceiling).  Cost is ~2 extra vector ops per knot over
    :func:`pl_lookup` — cheap compared to re-walking the knots once per RK
    stage, which is the point: the 6-stage Dormand-Prince step can evaluate
    the table once at the pre-step velocity and reconstruct every stage's
    value as ``f(v1) + f'(v1) * (clip(v_i) - clip(v1))`` — *exact* whenever
    the stage velocities stay inside the knot segment of v1 (stage spreads
    are O(h*a), far below the compressed knot spacing) and bounded by
    ``max|dslope| * |v_i - v1|`` when a stage straddles a knot.  See
    ``ops/integrator.rk5_step`` (radpres_per_stage='tangent').
    """
    y0 = pl.base[0]
    vmax = pl.base[1]
    v = jnp.clip(value, pl.knots[0], vmax)
    m = pl.knots.shape[0]
    acc = jnp.zeros_like(v)
    slope = jnp.zeros_like(v)
    zero = jnp.zeros((), v.dtype)
    for j in range(m):
        d = v - pl.knots[j]
        acc = acc + pl.dslope[j] * jnp.maximum(d, zero)
        slope = slope + jnp.where(d > 0, pl.dslope[j], zero)
    return y0 + acc, slope, v


def pl_lookup(pl: PLTable, value, block: int = 8192):
    """Evaluate the compressed table at ``value``; identical semantics to
    np.interp on the compressed knots with end clamping.

    For the knot counts the compressor produces (m <~ 512) the sum unrolls
    statically into one fused elementwise chain — no (N, m) intermediate
    ever hits HBM (measured 0.35 ms vs 0.50 ms blocked / 1.3 ms dense per
    1M lookups on v5e).  Larger tables fall back to a VMEM-blocked matvec.
    """
    y0 = pl.base[0]
    vmax = pl.base[1]
    v = jnp.clip(value, pl.knots[0], vmax)
    m = pl.knots.shape[0]
    if m <= 512:
        acc = jnp.zeros_like(v)
        for j in range(m):
            acc = acc + pl.dslope[j] * jnp.maximum(v - pl.knots[j], 0.0)
        return y0 + acc

    n = v.shape[0]
    pad = (-n) % block
    padded = jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) if pad else v

    def one_block(p):
        return jnp.maximum(p[:, None] - pl.knots[None, :], 0.0) @ pl.dslope

    out = jax.lax.map(one_block, padded.reshape(-1, block)).reshape(-1)
    return y0 + (out[:n] if pad else out)
