"""Photoionization and photodissociation rates.

Parity with ``nexoclom/atomicdata/photolossrates.py``: the total rate for a
species is the sum of kappa / aplanet^2 over *all* tabulated reactions for the
species (the reference ignores its own ``best_version`` flag when summing;
replicated here and noted in docs/QUIRKS.md).  Unknown species get the same
1e-30 /s floor.
"""
from __future__ import annotations

import functools
import os

import numpy as np

_DATAPATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data')


@functools.lru_cache(maxsize=1)
def _load_photorates_table():
    import pandas as pd
    return pd.read_csv(os.path.join(_DATAPATH, 'photorates.csv'))


class PhotoRate:
    """Photo-reaction rates for a species at heliocentric distance ``aplanet``.

    Attributes: ``species``, ``aplanet`` (AU), ``rate`` (1/s, summed over
    reactions), ``reactions`` (DataFrame or None).
    """

    def __init__(self, species: str, aplanet: float = 1.0):
        self.species = species
        self.aplanet = float(aplanet)

        table = _load_photorates_table()
        rows = table[table.species == species]
        if len(rows) == 0:
            print('No photoreactions found')
            self.reactions = None
            self.rate = 1e-30
        else:
            self.reactions = rows
            self.rate = float(np.sum(rows.kappa.values) / self.aplanet ** 2)

    def __str__(self):
        return (f'Species = {self.species}\n'
                f'Distance = {self.aplanet} AU\n'
                f'Rate = {self.rate} 1 / s')
