"""Small numeric helpers."""
from __future__ import annotations

import numpy as np


def minmaxmean(x):
    """(nanmin, nanmax, nanmean) in one call."""
    return np.nanmin(x), np.nanmax(x), np.nanmean(x)
