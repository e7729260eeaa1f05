"""g-values and radiation-pressure tables.

The g-value is the product of the solar flux at the Doppler-shifted emission
wavelength and the scattering probability per atom (Killen et al. 2009).
Radiation acceleration is a_rad = h g / (m lambda) summed over lines.

Parity notes (vs ``nexoclom/atomicdata/g_values.py``):

* The default data table is the same one the reference loads at runtime
  (``g-values.pkl``: Killen et al. 2009 rows plus two synthetic test
  entries), vendored as ``nexoclom_tpu/data/gvalues.csv``.
* The Killen 2022 tables the reference ships but never loads
  (``data/g-values/{Na,Ca,Mg}.Killen2022.csv``) are vendored as
  ``gvalues_killen2022.csv`` and selectable with ``version='Killen2022'``
  (input grammar: ``options.gvalue_version = Killen2022``).  Selection is
  STRICT — a species/line absent from the chosen dataset is absent, not
  backfilled from the other one.
* ``gValue.g`` scales as refpoint^2 / aplanet^2 (`g_values.py:86-87`).
* ``RadPresConst.accel`` interpolates each line's g onto the union velocity
  grid and sums h g/(m lambda) (`g_values.py:148-156`).
* Units here are plain floats/arrays: velocity in km/s, g in 1/s, accel in
  km/s^2 (the reference used astropy quantities with identical magnitudes).

Engine use: :func:`radpres_table` returns a uniform-velocity-grid lookup table
suitable for O(1) indexed interpolation inside a jitted step function.
"""
from __future__ import annotations

import functools
import os

import numpy as np

from nexoclom_tpu.atomicdata.atomicmass import atomicmass
from nexoclom_tpu.constants import ATOMIC_MASS_UNIT, PLANCK_CONSTANT

_DATAPATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data')


GVALUE_VERSIONS = {'killen2009': 'gvalues.csv',
                   'killen2022': 'gvalues_killen2022.csv'}
DEFAULT_GVALUE_VERSION = 'Killen2009'


def normalize_gvalue_version(version: str | None) -> str:
    """Canonical capitalization ('Killen2009'/'Killen2022'), case-insensitive
    input, with a clear error for unknown datasets."""
    v = (version or DEFAULT_GVALUE_VERSION).casefold()
    if v not in GVALUE_VERSIONS:
        raise ValueError(f'unknown g-value dataset {version!r}; available: '
                         + ', '.join(sorted('Killen' + k[-4:]
                                            for k in GVALUE_VERSIONS)))
    return 'Killen' + v[-4:]


@functools.lru_cache(maxsize=4)
def _load_gvalue_table(version: str = DEFAULT_GVALUE_VERSION):
    import pandas as pd
    fname = GVALUE_VERSIONS[normalize_gvalue_version(version).casefold()]
    return pd.read_csv(os.path.join(_DATAPATH, fname))


class gValue:
    """g-value vs. heliocentric radial velocity for one species/transition.

    Attributes: ``species``, ``wavelength`` (Angstrom), ``aplanet`` (AU),
    ``velocity`` (km/s, sorted), ``g`` (1/s, scaled to ``aplanet``).
    """

    def __init__(self, species: str, wavelength: float, aplanet: float = 1.0,
                 version: str = DEFAULT_GVALUE_VERSION):
        self.species = species
        self.wavelength = float(wavelength)
        self.aplanet = float(aplanet)
        self.version = normalize_gvalue_version(version)

        table = _load_gvalue_table(self.version)
        rows = table[(table.species == species) &
                     (table.wavelength == self.wavelength)]
        if len(rows) == 0:
            self.velocity = np.array([0.0, 1.0])
            self.g = np.array([0.0, 0.0])
            self.reference = None
            print(f'Warning: g-values not found for species = {species}')
        else:
            refs = rows.reference.unique()
            if len(refs) > 1:
                raise ValueError(
                    f'multiple g-value sources for {species} {wavelength}')
            order = np.argsort(rows.velocity.values)
            self.velocity = rows.velocity.values[order].astype(float)
            self.g = (rows.gvalue.values[order] *
                      rows.refpoint.values[order] ** 2 /
                      self.aplanet ** 2).astype(float)
            self.reference = refs[0]


class RadPresConst:
    """Radiation acceleration vs. radial velocity for a species.

    Attributes: ``velocity`` (km/s), ``accel`` (km/s^2), at distance
    ``aplanet`` (AU).
    """

    def __init__(self, species: str, aplanet: float = 1.0,
                 version: str = DEFAULT_GVALUE_VERSION):
        self.species = species
        self.aplanet = float(aplanet)
        self.version = normalize_gvalue_version(version)

        table = _load_gvalue_table(self.version)
        subset = table[table.species == species]
        if len(subset) == 0:
            self.velocity = np.array([0.0, 1.0])
            self.accel = np.array([0.0, 0.0])
            self.wavelength = np.array([])
            print(f'Warning: g-values not found for species = {species}')
            return

        self.wavelength = np.array(sorted(subset.wavelength.unique()))
        self.velocity = np.array(sorted(subset.velocity.unique()), dtype=float)

        mass_kg = atomicmass(species) * ATOMIC_MASS_UNIT
        accel = np.zeros_like(self.velocity)
        for wave in self.wavelength:
            gval = gValue(species, wave, aplanet, version=self.version)
            g_interp = np.interp(self.velocity, gval.velocity, gval.g)
            # h g / (m lambda): J s * 1/s / (kg * m) = m/s^2 -> km/s^2
            accel += (PLANCK_CONSTANT * g_interp /
                      (mass_kg * wave * 1e-10)) / 1e3
        self.accel = accel


def radpres_table(species: str, aplanet: float, npoints: int | None = None,
                  version: str = DEFAULT_GVALUE_VERSION):
    """Uniform-grid radiation-pressure lookup table for the jitted engine.

    Returns ``(v0, dv, accel)`` with velocity in km/s and accel in km/s^2,
    where ``accel[i]`` is the acceleration at velocity ``v0 + i * dv``.
    Outside the table range the acceleration clamps to the end values,
    matching ``np.interp`` semantics used by the reference state function
    (``particle_tracking/state.py:35-36``).
    """
    rp = RadPresConst(species, aplanet, version=version)
    v = rp.velocity
    if npoints is None:
        # At least as fine as the densest source table (the Killen grids are
        # 49-389 points); kept small because the on-device dense lookup costs
        # O(K) per packet (see ops/integrator.uniform_lookup).
        npoints = max(512, len(v) + 1)
    grid = np.linspace(v[0], v[-1], npoints)
    accel = np.interp(grid, v, rp.accel)
    dv = grid[1] - grid[0] if npoints > 1 else 1.0
    return float(grid[0]), float(dv), accel


def gvalue_table(species: str, wavelengths, aplanet: float,
                 npoints: int | None = None,
                 version: str = DEFAULT_GVALUE_VERSION):
    """Uniform-grid summed g-value lookup table (for LOS/image weighting).

    Sums the g-values of the requested ``wavelengths`` onto one uniform
    velocity grid.  Returns ``(v0, dv, g)`` (km/s, km/s, 1/s).
    """
    gvals = [gValue(species, w, aplanet, version=version)
             for w in wavelengths]
    vmin = min(g.velocity[0] for g in gvals)
    vmax = max(g.velocity[-1] for g in gvals)
    if npoints is None:
        # at least as fine as the union of the source grids (offset line
        # grids would otherwise be undersampled in the Fraunhofer-well
        # cores) — same guard as radpres_table
        union = np.unique(np.concatenate([g.velocity for g in gvals]))
        npoints = max(512, len(union) + 1)
    grid = np.linspace(vmin, vmax, npoints)
    total = np.zeros_like(grid)
    for g in gvals:
        total += np.interp(grid, g.velocity, g.g)
    dv = grid[1] - grid[0] if npoints > 1 else 1.0
    return float(grid[0]), float(dv), total
