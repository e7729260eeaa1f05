"""Axis-angle rotation matrix (parity with ``nexoclom/math/rotation_matrix.py``).

Note the reference builds the matrix in row-vector ("active-transpose")
convention; we keep the identical element layout so downstream uses
(``ModelImage.image_rotation``) produce the same rotated coordinates.
"""
from __future__ import annotations

import numpy as np


def rotation_matrix(theta: float, axis) -> np.ndarray:
    """Rotation by ``theta`` radians about ``axis`` (3-vector)."""
    unit = np.asarray(axis, dtype=float)
    unit = unit / np.linalg.norm(unit)
    lx, ly, lz = unit
    c, s = np.cos(theta), np.sin(theta)
    return np.array([
        [lx * lx + (1 - lx * lx) * c, lx * ly * (1 - c) + lz * s,
         lx * lz * (1 - c) - ly * s],
        [lx * ly * (1 - c) - lz * s, ly * ly + (1 - ly * ly) * c,
         ly * lz * (1 - c) + lx * s],
        [lx * lz * (1 - c) + ly * s, ly * lz * (1 - c) - lx * s,
         lz * lz + (1 - lz * lz) * c],
    ])
