"""On-device scatter-add histograms.

Replaces host-side ``np.histogram``/``np.histogram2d`` post-processing
(``nexoclom/math/histogram.py``, ``ModelImage.py:264-269``) with jit-friendly
``.at[].add`` scatter-adds so observables accumulate on device, inside the
step loop if desired, and reduce over a sharded packet axis with an XLA
collective instead of a host gather.

Bin conventions match ``np.histogram`` with explicit ranges: ``nbins`` equal
bins over [lo, hi); samples outside the range are dropped; the last edge is
inclusive (np.histogram puts x == hi in the last bin — replicated here).
"""
from __future__ import annotations

import jax.numpy as jnp


def _bin_index(values, lo, hi, nbins):
    width = (hi - lo) / nbins
    idx = jnp.floor((values - lo) / width).astype(jnp.int32)
    # np.histogram includes the right edge in the last bin
    idx = jnp.where(values == hi, nbins - 1, idx)
    in_range = (values >= lo) & (values <= hi)
    return jnp.clip(idx, 0, nbins - 1), in_range


def histogram1d(values, weights, lo, hi, nbins: int):
    """Weighted 1-D histogram; returns (nbins,) array."""
    idx, ok = _bin_index(values, lo, hi, nbins)
    w = jnp.where(ok, weights, 0.0)
    return jnp.zeros(nbins, dtype=w.dtype).at[idx].add(w)


def histogram2d(xvals, yvals, weights, xlo, xhi, nx: int, ylo, yhi, ny: int):
    """Weighted 2-D histogram; returns (nx, ny) array."""
    ix, okx = _bin_index(xvals, xlo, xhi, nx)
    iy, oky = _bin_index(yvals, ylo, yhi, ny)
    w = jnp.where(okx & oky, weights, 0.0)
    flat = ix * ny + iy
    hist = jnp.zeros(nx * ny, dtype=w.dtype).at[flat].add(w)
    return hist.reshape(nx, ny)


def bin_centers(lo, hi, nbins: int):
    width = (hi - lo) / nbins
    return lo + width * (jnp.arange(nbins) + 0.5)
