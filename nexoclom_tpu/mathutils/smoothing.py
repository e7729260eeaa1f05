"""Smoothing helpers (parity with ``nexoclom/math/smooth.py``).

``smooth2d`` uses a scipy Gaussian kernel convolution instead of
astropy.convolution (not available in this environment); boundary handling
matches ('wrap' vs 'extend'/'nearest').
"""
from __future__ import annotations

import numpy as np


def smooth(array, num=7, method='mean', wrap=False):
    """Running mean/median of full width ``num`` (window [i-num/2, i+num/2])."""
    funcs = {'mean': np.mean, 'median': np.median}
    func = funcs.get(method)
    if not isinstance(array, np.ndarray) or func is None:
        raise TypeError('smooth requires an ndarray and method mean|median')
    out = np.zeros_like(array, dtype=float)
    wid = int(num) // 2
    n = len(array)
    for i in range(n):
        inds = np.arange(i - wid, i + wid + 1)
        if wrap:
            inds = inds % n
        else:
            inds = inds[(inds >= 0) & (inds < n)]
        out[i] = func(array[inds])
    return out


def smooth2d(array, num=1, method='gaussian', wrap=False):
    """2-D Gaussian smoothing with stddev ``num`` pixels."""
    if method.casefold() != 'gaussian':
        raise TypeError('smooth2d supports only gaussian smoothing')
    from scipy.ndimage import gaussian_filter
    mode = 'wrap' if wrap else 'nearest'
    return gaussian_filter(np.asarray(array, dtype=float), sigma=num,
                           mode=mode)
