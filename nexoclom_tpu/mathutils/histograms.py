"""Bin-centred histogram wrappers (parity with ``nexoclom/math/histogram.py``).

These are host-side (numpy) conveniences used by result post-processing; the
on-device scatter-add histograms used inside jitted code live in
:mod:`nexoclom_tpu.ops.histograms`.
"""
from __future__ import annotations

import numpy as np


class Histogram:
    """``np.histogram`` with the x axis reported at bin centres."""

    def __init__(self, a, bins=10, range=None, weights=None, density=None):
        hist, edges = np.histogram(a, bins=bins, range=range, weights=weights,
                                   density=density)
        self.histogram = hist.astype(float)
        self.dx = edges[1] - edges[0]
        self.x = edges[:-1] + self.dx / 2

    def __repr__(self):
        lines = [f"{'x':>10} {'count':>12}"]
        lines += [f'{x:10.4f} {h:12.4f}' for x, h in zip(self.x, self.histogram)]
        return '\n'.join(lines)


class Histogram2d:
    """``np.histogram2d`` with x/y axes reported at bin centres."""

    def __init__(self, ptsx, ptsy, bins=10, range=None, weights=None,
                 density=None):
        hist, xedges, yedges = np.histogram2d(ptsx, ptsy, bins=bins,
                                              range=range, weights=weights,
                                              density=density)
        self.histogram = hist
        self.dx = xedges[1] - xedges[0]
        self.dy = yedges[1] - yedges[0]
        self.x = xedges[:-1] + self.dx / 2
        self.y = yedges[:-1] + self.dy / 2


class HistogramSphere:
    """Cap-smoothed histogram of points on a sphere.

    A working implementation of the reference's ``HistogramSphere``
    (``math/histogram.py``; broken there by a missing KDTree import — see
    docs/QUIRKS.md F10): for each cell centre of a lon/lat grid, sums the
    weights of all points within angular radius ``dphi``.
    """

    def __init__(self, longitude, latitude, weights=None,
                 dphi=np.deg2rad(5), bins=(180, 90)):
        longitude = np.asarray(longitude, dtype=float)
        latitude = np.asarray(latitude, dtype=float)
        if isinstance(bins, int):
            bins = (bins, bins)
        self.bins = tuple(bins)
        self.dphi = float(dphi)

        self.longitude = (np.linspace(0, 2 * np.pi, bins[0],
                                      endpoint=False) +
                          np.pi / bins[0])
        self.latitude = (np.linspace(-np.pi / 2, np.pi / 2, bins[1],
                                     endpoint=False) +
                         np.pi / 2 / bins[1])

        pts = np.stack([np.cos(longitude) * np.cos(latitude),
                        np.sin(longitude) * np.cos(latitude),
                        np.sin(latitude)], axis=1)
        glon, glat = np.meshgrid(self.longitude, self.latitude)
        grid = np.stack([(np.cos(glon) * np.cos(glat)).ravel(),
                         (np.sin(glon) * np.cos(glat)).ravel(),
                         np.sin(glat).ravel()], axis=1)

        from scipy.spatial import KDTree
        # chord length corresponding to the angular cap radius
        chord = 2.0 * np.sin(self.dphi / 2.0)
        tree = KDTree(pts)
        neighbours = tree.query_ball_point(grid, chord)
        if weights is None:
            result = np.array([len(idx) for idx in neighbours], dtype=float)
        else:
            weights = np.asarray(weights, dtype=float)
            result = np.array([weights[idx].sum() for idx in neighbours])
        self.histogram = result.reshape(glat.shape)
