"""Host-side (numpy) random deviates from tabulated distributions.

These mirror ``nexoclom/math/randomdeviates.py`` semantics and exist for
host-side utilities and as the independent cross-check for the on-device
samplers in :mod:`nexoclom_tpu.ops.samplers` (which use the same
cumsum-inverse-CDF construction under ``jax.random`` keys).

The 2-D sampler here uses inverse-CDF marginal/conditional sampling rather
than the reference's acceptance-rejection loop: rejection loops do not
vectorise under jit, and the inverse-CDF construction draws from the same
gridded pdf (verified by KS tests).
"""
from __future__ import annotations

import numpy as np


def cdf_from_pdf(f_x: np.ndarray) -> np.ndarray:
    """Reference-style cumulative distribution: plain cumsum, shifted to start
    at 0 and normalised to end at 1 (``randomdeviates.py:30-32``)."""
    c = np.cumsum(np.asarray(f_x, dtype=float))
    c = c - c[0]
    return c / c[-1]


def random_deviates_1d(x, f_x, num, rng=None):
    """Draw ``num`` samples from tabulated pdf ``f_x`` over ``x``.

    Uses the transformation method on the cumsum CDF, matching the reference's
    grid handling (x is re-gridded uniformly over [min, max] with len(f_x)
    points).
    """
    rng = np.random.default_rng() if rng is None else rng
    x = np.asarray(x, dtype=float)
    x_ = np.linspace(x.min(), x.max(), len(f_x))
    return np.interp(rng.random(int(num)), cdf_from_pdf(f_x), x_)


def random_deviates_2d(fdist, x0, y0, num, rng=None):
    """Draw ``num`` (x, y) samples from the 2-D tabulated pdf ``fdist``.

    ``fdist[i, j]`` is the relative probability at ``(x0[i], y0[j])``; the
    axes are treated as uniform grids over their ranges, as in the reference.
    Samples the x marginal then the conditional y distribution by inverse CDF,
    with uniform jitter within a grid cell.
    """
    rng = np.random.default_rng() if rng is None else rng
    fdist = np.asarray(fdist, dtype=float)
    x0 = np.asarray(x0, dtype=float)
    y0 = np.asarray(y0, dtype=float)
    x_ = np.linspace(x0.min(), x0.max(), fdist.shape[0])
    y_ = np.linspace(y0.min(), y0.max(), fdist.shape[1])

    # x marginal
    marg = fdist.sum(axis=1)
    xs = np.interp(rng.random(int(num)), cdf_from_pdf(marg), x_)

    # conditional on the nearest x row (cell-level approximation of the
    # bilinear pdf the reference rejection-samples)
    rows = np.clip(np.searchsorted(x_, xs), 0, fdist.shape[0] - 1)
    u = rng.random(int(num))
    ys = np.empty(int(num))
    for row in np.unique(rows):
        sel = rows == row
        ys[sel] = np.interp(u[sel], cdf_from_pdf(fdist[row]), y_)
    return xs, ys
