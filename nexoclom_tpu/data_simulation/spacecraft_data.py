"""Spacecraft observation container.

The reference consumes an external ``MESSENGERuvvs.MESSENGERdata`` object
(``LOSResult.py:75-103``); this package ships a self-contained equivalent so
any spacecraft dataset can drive LOS simulations.  Required columns in
``data`` (model-frame coordinates, R_planet):

    x, y, z              spacecraft position
    xbore, ybore, zbore  unit boresight vector
    radiance             observed radiance (kR)
    sigma                radiance uncertainty (kR)

Optional: ``alttan`` (tangent altitude, for the ``minalt`` mask) and
``subslong`` (sub-solar longitude per spectrum, for planet-fixed source
maps).

``set_frame('Model')`` is a hook for frame conversion; data supplied in the
model frame passes through unchanged (subclass to integrate a mission
dataset with its own frames, as MESSENGERuvvs does for the reference).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

REQUIRED = ('x', 'y', 'z', 'xbore', 'ybore', 'zbore', 'radiance', 'sigma')


class SpacecraftData:
    def __init__(self, data: pd.DataFrame, species: str,
                 query: str = '', subslong=None):
        missing = [c for c in REQUIRED if c not in data.columns]
        if missing:
            raise ValueError(f'SpacecraftData missing columns: {missing}')
        self.data = data.copy()
        self.species = species
        self.query = query
        self.frame = 'Model'
        if subslong is not None:
            self.subslong = pd.Series(np.broadcast_to(subslong, len(data)),
                                      index=data.index)
        elif 'subslong' in data.columns:
            self.subslong = data['subslong']
        else:
            self.subslong = pd.Series(np.zeros(len(data)), index=data.index)
        # LOSResult instances register themselves here by label
        # (used by the fitted-source retrieval, LOSResultFitted.py:21,71)
        self.model_result = {}

    def set_frame(self, frame: str):
        if frame != 'Model':
            raise NotImplementedError(
                'only model-frame data is supported; convert before '
                'constructing SpacecraftData')
        self.frame = frame

    def model(self, inputs, npackets, dphi=None, params=None,
              label='LOSResult', masking=None, overwrite=False, seed=None,
              **run_kwargs):
        """Run the model for these observations and fit the source rate.

        The convenience chain the reference exposes through
        ``MESSENGERdata.model(inputs, npackets, ...)`` (exercised by its
        system test, ``tests/system_tests/test_run_through.py:19-31``):
        simulate any missing packets, compute/restore the LOS iterations,
        and scale the model onto the data.  Returns the LOSResult.
        """
        import math

        from nexoclom_tpu.data_simulation.los_result import LOSResult

        cull_block = run_kwargs.pop('cull_block', None)
        inputs.run(npackets, overwrite=overwrite, seed=seed, **run_kwargs)
        los = LOSResult(self, inputs, params,
                        dphi=math.radians(1.0) if dphi is None else dphi,
                        masking=masking, label=label,
                        sharded=run_kwargs.get('sharded', False),
                        cull_block=cull_block)
        los.simulate_data_from_inputs(self)
        return los

    def __len__(self):
        return len(self.data)
