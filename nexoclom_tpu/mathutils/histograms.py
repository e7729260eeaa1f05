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
