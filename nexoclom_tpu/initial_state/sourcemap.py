"""Container for surface/speed/angular source distributions.

Parity with ``nexoclom/initial_state/SourceMap.py``: loads from a dict, a
pickle file (containing a dict or SourceMap), or an IDL ``.sav`` file.
Angles are radians, speeds km/s, stored as plain numpy arrays.
"""
from __future__ import annotations

import pickle

import numpy as np

from nexoclom_tpu.utilities.exceptions import InputError

_FIELDS = ('abundance', 'longitude', 'latitude', 'speed', 'speed_dist',
           'azimuth', 'azimuth_dist', 'altitude', 'altitude_dist',
           'fraction_observed')


def _strip_units(value):
    """Accept raw arrays or astropy-quantity-like objects (with .value)."""
    if value is None:
        return None
    value = getattr(value, 'value', value)
    return np.asarray(value)


class SourceMap:
    def __init__(self, sourcemap=None):
        for field in _FIELDS:
            setattr(self, field, None)
        self.coordinate_system = 'solar-fixed'

        if isinstance(sourcemap, dict):
            self.load_dict(sourcemap)
        elif isinstance(sourcemap, str) and sourcemap.endswith('.pkl'):
            with open(sourcemap, 'rb') as f:
                loaded = pickle.load(f)
            if isinstance(loaded, SourceMap):
                self.load_dict(loaded.__dict__)
            elif isinstance(loaded, dict):
                self.load_dict(loaded)
            elif hasattr(loaded, '__dict__'):
                # pickles written by the reference package contain its own
                # SourceMap class; duck-type through the instance dict
                self.load_dict(loaded.__dict__)
            else:
                raise InputError('SourceMap', 'problem with mapfile')
        elif isinstance(sourcemap, str) and sourcemap.endswith('.sav'):
            from scipy.io import readsav
            loaded = readsav(sourcemap)
            self.load_dict({k: loaded.get(k) for k in
                            (*_FIELDS, 'coordinate_system')})
        elif sourcemap is None:
            pass
        else:
            print('No source map created')

    def load_dict(self, source: dict):
        for field in _FIELDS:
            setattr(self, field, _strip_units(source.get(field)))
        coord = source.get('coordinate_system', 'solar-fixed')
        self.coordinate_system = str(coord)

    def to_dict(self) -> dict:
        out = {field: getattr(self, field) for field in _FIELDS}
        out['coordinate_system'] = self.coordinate_system
        return out
