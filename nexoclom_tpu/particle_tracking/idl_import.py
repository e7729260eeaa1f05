"""Import shim for predecessor IDL-model outputs.

Parity with ``nexoclom/particle_tracking/IDLout.py``: reads the ``.sav``
outputs of the IDL-heritage exosphere model for comparison runs.  Exposes the
packet arrays as pandas DataFrames with this package's column conventions.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


class IDLout:
    """Load an IDL ``.sav`` model output.

    Attributes: ``X`` (DataFrame with time/x/y/z/vx/vy/vz/frac where
    present), ``npackets``, ``meta`` (remaining scalars from the save file).
    """

    _COLUMNS = ('time', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac')

    def __init__(self, savfile: str):
        from scipy.io import readsav
        saved = readsav(savfile, python_dict=True)
        self.savfile = savfile

        columns = {}
        for key, value in saved.items():
            lower = key.lower()
            if lower in self._COLUMNS:
                columns[lower] = np.asarray(value).ravel()
        if not columns:
            # single record-array layout
            for value in saved.values():
                names = getattr(getattr(value, 'dtype', None), 'names', None)
                if names:
                    record = value[0] if value.shape else value
                    for name in names:
                        if name.lower() in self._COLUMNS:
                            columns[name.lower()] = np.asarray(
                                record[name]).ravel()
                    break
        if not columns:
            raise ValueError(f'no packet arrays found in {savfile}')

        self.X = pd.DataFrame(columns)
        self.npackets = len(self.X)
        self.meta = {k: v for k, v in saved.items()
                     if k.lower() not in columns}
