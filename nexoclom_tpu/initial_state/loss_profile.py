"""Spatially varying electron-impact loss profiles (quirk F23).

The reference's electron-impact hook was meant to evaluate a
position-dependent rate through magnetic coordinates
(``state.py:56-63``: ``magcoord = xyz_to_magcoord(...)`` then "Compute
electron impact rate" — all commented out behind ``assert 0``, and
``xyz_to_magcoord`` itself is a stub).  This build implements the
physically dominant case — a rotationally symmetric plasma-torus /
ionosphere profile — as a SEPARABLE rate field in cylindrical coordinates
about the planet's spin axis:

    rate(rho, z) = f(rho) * g(z)        [1/s]

with ``rho = sqrt(x^2 + y^2)`` and both factors tabulated on 1-D grids in
planet radii.  Separability covers the standard torus parameterisation
(radial profile x vertical Gaussian about the centrifugal equator); with
``options.eimp_tilt`` the symmetry axis tilts off the spin axis and
co-rotates with the planet — the true centrifugal-equator geometry
(quirk F25, evaluated in ``ops/integrator.state_eval``).  On device each
factor is a knot-compressed relu expansion (:mod:`nexoclom_tpu.ops.pltable`)
— pure FMA per RK stage, no gather — so the profile costs about as much
as the radiation-pressure lookup.

File format (``options.eimp_profile = <path>``): a pickled dict, ``.npz``,
or in-memory dict with

    rho      (n,) cylindrical radius grid, planet radii, increasing
    rate     (n,) electron-impact rate at rho, 1/s
    z        (m,) optional height grid, planet radii, increasing
    rate_z   (m,) optional dimensionless vertical factor (g(z))

End clamping follows np.interp: outside the grids the END VALUES hold, so
profiles should taper to 0 at their edges to vanish far away.  Rates are
applied everywhere (electrons are not blocked by the planet's shadow),
matching the constant ``eimp_rate`` channel (quirk F22).
"""
from __future__ import annotations

import os
import pickle

import numpy as np

from nexoclom_tpu.utilities.exceptions import InputError


def load_loss_profile(source):
    """Load and validate a loss profile.

    ``source`` is a file path (.pkl / .npz) or an in-memory dict.
    Returns ``(rho, rate, z, rate_z)`` as float64 arrays; ``z``/``rate_z``
    are None for radial-only profiles.
    """
    if isinstance(source, dict):
        data = source
    elif isinstance(source, str):
        if not os.path.exists(source):
            raise InputError('load_loss_profile',
                             f'eimp_profile file {source!r} does not exist')
        if source.endswith('.npz'):
            with np.load(source) as f:
                data = {k: f[k] for k in f.files}
        else:
            with open(source, 'rb') as f:
                data = pickle.load(f)
            if not isinstance(data, dict):
                raise InputError('load_loss_profile',
                                 f'{source}: expected a pickled dict')
    else:
        raise InputError('load_loss_profile',
                         f'unsupported profile source {type(source)}')

    def grid_pair(xkey, ykey, required):
        if xkey not in data or ykey not in data:
            if required:
                raise InputError('load_loss_profile',
                                 f'profile needs {xkey!r} and {ykey!r}')
            return None, None
        x = np.asarray(data[xkey], np.float64).ravel()
        y = np.asarray(data[ykey], np.float64).ravel()
        if x.shape != y.shape or len(x) < 2:
            raise InputError('load_loss_profile',
                             f'{xkey}/{ykey} must match with >= 2 points')
        if not np.all(np.diff(x) > 0):
            raise InputError('load_loss_profile',
                             f'{xkey} must be strictly increasing')
        if not (np.isfinite(x).all() and np.isfinite(y).all()):
            raise InputError('load_loss_profile',
                             f'{xkey}/{ykey} contain non-finite values')
        if (y < 0).any():
            raise InputError('load_loss_profile',
                             f'{ykey} must be non-negative')
        return x, y

    rho, rate = grid_pair('rho', 'rate', required=True)
    z, rate_z = grid_pair('z', 'rate_z', required=False)
    if rho[0] < 0:
        raise InputError('load_loss_profile', 'rho must be >= 0')
    return rho, rate, z, rate_z


def profile_tables(source, dtype=np.float64, rel_tol: float = 1e-3):
    """Compressed device tables ``(rho_pl, z_pl)`` for the engine;
    ``z_pl`` is None for radial-only profiles (g == 1)."""
    from nexoclom_tpu.ops.pltable import compress_points
    rho, rate, z, rate_z = load_loss_profile(source)
    rho_pl = compress_points(rho, rate, rel_tol=rel_tol, dtype=dtype)
    z_pl = (compress_points(z, rate_z, rel_tol=rel_tol, dtype=dtype)
            if z is not None else None)
    return rho_pl, z_pl
