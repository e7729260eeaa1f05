"""Speed-distribution shape functions (parity with ``nexoclom/math/distributions.py``).

All functions return dimensionless relative probabilities normalised to a peak
of 1, evaluated on a velocity grid in km/s.
"""
from __future__ import annotations

import numpy as np

from nexoclom_tpu.atomicdata.atomicmass import atomicmass
from nexoclom_tpu.constants import binding_speed_kms, thermal_speed_kms


def sputdist(velocity_kms, U_ev: float, alpha: float, beta: float,
             species: str) -> np.ndarray:
    """Sigmund-Thompson sputtering distribution
    f(v) = v^(2 beta + 1) / (v^2 + v_b^2)^alpha with v_b = sqrt(2U/m)."""
    v = np.asarray(velocity_kms, dtype=float)
    v_b = binding_speed_kms(U_ev, atomicmass(species))
    f_v = v ** (2 * beta + 1) / (v ** 2 + v_b ** 2) ** alpha
    return f_v / np.max(f_v)


def MaxwellianDist(velocity_kms, temperature_k: float,
                   species: str) -> np.ndarray:
    """Flux-weighted Maxwellian f(v) = v^3 exp(-v^2 / v_th^2),
    v_th = sqrt(2 k T / m)."""
    v = np.asarray(velocity_kms, dtype=float)
    vth2 = thermal_speed_kms(temperature_k, atomicmass(species)) ** 2
    f_v = v ** 3 * np.exp(-v ** 2 / vth2)
    return f_v / np.max(f_v)


class CumDist:
    """Cumulative distribution of samples or of a tabulated pdf."""

    def __init__(self, x, y=None):
        order = np.argsort(x)
        self.x = np.asarray(x)[order]
        if y is None:
            self.sum = np.linspace(0, 1, len(self.x))
        else:
            s = np.cumsum(np.asarray(y)[order])
            s = s - s.min()
            self.sum = s / s.max()
