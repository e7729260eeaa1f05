"""Base class for model-vs-data comparisons.

Parity with ``nexoclom/data_simulation/ModelResult.py``: the same params
grammar (dict or ``key = value`` file), quantity validation
(column/radiance/density/difrad), default wavelengths per species
(Na 5891+5897 A, Ca 4227 A, Mg 2852 A), and packet weighting:

* column / density -> weight = frac;
* radiance (resonant scattering) -> weight = frac * out_of_shadow * g / 1e6,
  with the g-value interpolated against the heliocentric radial velocity
  (``ModelResult.py:140-170``).
"""
from __future__ import annotations

import copy
import os

import numpy as np

from nexoclom_tpu.atomicdata import gValue
from nexoclom_tpu.utilities.exceptions import InputError

QUANTITIES = ('column', 'radiance', 'density', 'difrad')

DEFAULT_WAVELENGTHS = {
    'Na': (5891.0, 5897.0),
    'Ca': (4227.0,),
    'Mg': (2852.0,),
}


def parse_params(params) -> dict:
    """Accept a dict or a ``key = value`` parameter file (same comment
    grammar as input files)."""
    if isinstance(params, dict):
        return dict(params)
    if isinstance(params, str):
        if not os.path.exists(params):
            raise FileNotFoundError(params)
        out = {}
        with open(params) as f:
            for line in f:
                for comment in (';', '#'):
                    if comment in line:
                        line = line[:line.find(comment)]
                if '=' in line:
                    key, value = line.split('=', 1)
                    out[key.strip().lower()] = value.strip()
        return out
    raise TypeError('params must be a dict or a filename')


class ModelResult:
    def __init__(self, inputs, params):
        self.inputs = copy.deepcopy(inputs)
        self.outid, self.outputfiles, _, _ = self.inputs.search()
        self.npackets = 0
        self.totalsource = 0.0
        self.atoms_per_packet = 0.0
        self.sourcerate = 0.0        # units of 1e23 atoms/s
        self.params = parse_params(params)

        self.quantity = self.params.get('quantity')
        if self.quantity not in QUANTITIES:
            raise InputError('ModelResult.__init__',
                             f"quantity must be one of {QUANTITIES}")

        self.g = self.params.get('g')

        if self.quantity in ('radiance', 'difrad'):
            self.mechanism = ['resonant scattering']
            if 'wavelength' in self.params:
                self.wavelength = tuple(sorted(
                    float(w.strip())
                    for w in str(self.params['wavelength']).split(',')))
            else:
                species = self.inputs.options.species
                if species not in DEFAULT_WAVELENGTHS:
                    raise InputError(
                        'ModelResult.__init__',
                        f'Default wavelengths not available for {species}')
                self.wavelength = DEFAULT_WAVELENGTHS[species]
        else:
            self.mechanism = None
            self.wavelength = None

        self.radius_km = self.inputs.geometry.planet.radius

    def packet_weighting(self, frac, radvel_model, aplanet,
                         out_of_shadow=1.0) -> np.ndarray:
        """Per-packet weights.

        ``radvel_model`` is the heliocentric radial velocity in model units
        (vy + vrplanet, R_p/s); converted to km/s for the g-value tables.
        """
        frac = np.asarray(frac, dtype=float)
        if self.quantity in ('column', 'density'):
            weight = frac.copy()
        elif self.quantity in ('radiance', 'difrad'):
            if self.g is None:
                gg = np.zeros_like(frac)
                radvel_kms = np.asarray(radvel_model) * self.radius_km
                version = getattr(self.inputs.options, 'gvalue_version',
                                  'Killen2009')
                for wave in self.wavelength:
                    gval = gValue(self.inputs.options.species, wave, aplanet,
                                  version=version)
                    gg += np.interp(radvel_kms, gval.velocity, gval.g)
            else:
                gg = float(self.g)
            weight = frac * out_of_shadow * gg / 1e6
        else:
            raise InputError('ModelResult.packet_weighting',
                             f'{self.quantity} is invalid.')
        if not np.all(np.isfinite(weight)):
            raise ValueError('Non-finite packet weights')
        return weight

    def transform_reference_frame(self, packets):
        """Moon-centric frame transform hook (unimplemented placeholder in
        the reference as well — ``SourceMap.py:89-119`` commented out)."""
        raise NotImplementedError(
            'moon-centric reference frames are not implemented')
