"""LOS result management: cached iterations over output files, source-rate
fitting, and data masking.

Parity with ``nexoclom/data_simulation/LOSResult.py``:

* per-outputfile iterations are computed once and cached through the catalog
  (``search_iterations``/``restore_iteration``, ``LOSResult.py:119-169``);
* radiance sums over iterations; ``atoms_per_packet = 1e23 /
  (totalsource / endtime)``; radiance converts to kR with the factor
  atoms_per_packet / 1e3 (``:262-271``);
* the source rate is a weighted linear least-squares scaling of model onto
  data (``determine_source_rate``, ``:278-308``) — the closed form of the
  astropy Multiply/LinearLSQFitter the reference uses;
* the masking DSL supports ``middleXX``, ``minaltX``, ``minsnrX`` and
  ``siglimitX`` (``make_mask``, ``:171-200``).
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd

from nexoclom_tpu.data_simulation.compute_iteration import (IterationResult,
                                                            compute_iteration)
from nexoclom_tpu.data_simulation.model_result import ModelResult
from nexoclom_tpu.utilities.catalog import get_catalog


class LOSResult(ModelResult):
    """Line-of-sight radiance/column from all output files of an Input.

    ``scdata`` is a :class:`~nexoclom_tpu.data_simulation.spacecraft_data.SpacecraftData`
    (or any object with the same interface).

    ``sharded=True`` (or a mesh with a ``'packets'`` axis) spreads the
    packet axis of the O(S x N) cone reduction over the local devices —
    the per-spectrum sums cross shards through an XLA psum, and results
    match the single-device run (tests/test_data_simulation.py).  The
    same switch as ``Input.run(sharded=...)``.
    """

    def __init__(self, scdata, inputs, params=None, dphi=math.radians(1.0),
                 **kwargs):
        if params is None:
            params = {'quantity': 'radiance'}
        scdata.set_frame('Model')
        super().__init__(inputs, params)

        self.species = scdata.species
        self.query = scdata.query
        self.type = 'LineOfSight'
        self.dphi = float(dphi)
        self._oedge = min(self.inputs.options.outeredge * 2, 100)

        self.fitted = self.inputs.options.fitted
        nspec = len(scdata)
        self.radiance = pd.Series(np.zeros(nspec), index=scdata.data.index)
        self.npackets_los = pd.Series(np.zeros(nspec, dtype=int),
                                      index=scdata.data.index)
        self.sourcemap = None
        self.modelfiles = None
        self.goodness_of_fit = None
        self.mask = None
        self.masking = kwargs.get('masking')
        self.fit_method = kwargs.get('fit_method')
        self.sharded = kwargs.get('sharded', False)
        # opt-in two-stage block cull for the cone reduction (the KDTree-
        # prefilter role, compute_iteration.py:171-173): packet block
        # size for ops.los.los_reduce_culled; 0 = exact dense reduction
        # None = never set (downstream defaults decide, e.g. the smear's
        # 'auto'); an EXPLICIT 0 is a dense opt-out that inherits as such.
        # 'auto' (the spelled-out backend default accepted by the other
        # family members) is the same as unset here: downstream
        # resolve_cull_block picks the backend block.
        _cb = kwargs.get('cull_block', None)
        if _cb == 'auto':
            _cb = None
        self.cull_block = None if _cb is None else int(_cb or 0)
        # force the device retrieval arithmetic to a dtype regardless of
        # process x64 state — the common-random-numbers accuracy probe
        # retrieves ONE saved engine output in f32 AND f64 to isolate the
        # retrieval-stage rounding from engine MC decorrelation
        # (scripts/validate_accuracy.py --case fit-stage)
        self.compute_dtype = kwargs.get('compute_dtype', None)
        self.label = kwargs.get('label', 'LOSResult')
        scdata.model_result[self.label] = self

    def __str__(self):
        return (f'Model Label = {self.label}\n'
                f'quantity = {self.quantity}\n'
                f'npackets = {self.npackets}\n'
                f'totalsource = {self.totalsource}\n'
                f'atoms per packet = {self.atoms_per_packet}\n'
                f'sourcerate = {self.sourcerate} x 1e23 atoms/s\n'
                f'dphi = {self.dphi}\n'
                f'fitted = {self.fitted}')

    # ------------------------------------------------------------- caching
    def _iteration_criteria(self, fitted=False, unfit_idnum=None):
        criteria = dict(quantity=self.quantity, query=self.query,
                        dphi=self.dphi,
                        mechanism=list(self.mechanism or []),
                        wavelength=list(self.wavelength or []),
                        fitted=bool(fitted), unfit_idnum=unfit_idnum)
        # a forced retrieval dtype changes the numbers: keep its cached
        # iterations separate (the fit-stage accuracy probe retrieves ONE
        # catalog at both precisions).  None for the default path, which
        # also matches records from before this key existed (catalog
        # search is r.get(k) == v).
        cdt = getattr(self, 'compute_dtype', None)
        criteria['compute_dtype'] = None if cdt is None else str(cdt)
        return criteria

    def search_iterations(self, fitted=False):
        """{outputfile: (model_idnum, unfit_idnum, modelfile) or None}"""
        catalog = get_catalog()
        results = {}
        for oid, outputfile in zip(self.outid, self.outputfiles):
            rows = catalog.search_losmodels(
                out_idnum=oid, **self._iteration_criteria(fitted=fitted))
            if len(rows) > 1:
                raise RuntimeError(
                    f'multiple cached LOS models for output {oid}')
            if rows:
                results[outputfile] = (rows[0]['idnum'],
                                       rows[0].get('unfit_idnum'),
                                       rows[0]['filename'])
            else:
                results[outputfile] = None
        return results

    def restore_iteration(self, search_result) -> IterationResult:
        idnum, _, modelfile = search_result
        result = IterationResult.load(modelfile, self)
        result.model_idnum = idnum
        return result

    # ------------------------------------------------------------- masking
    def make_mask(self, data):
        """(mask, sigmalimit) from the masking DSL string."""
        mask = np.ones(len(data), dtype=bool)
        sigmalimit = None
        if self.masking is not None:
            for masktype in self.masking.split(';'):
                masktype = masktype.strip().lower()
                if masktype.startswith('middle'):
                    per = float(masktype[6:])
                    lo, hi = np.percentile(data.radiance,
                                           [50 - per / 2, 50 + per / 2])
                    mask &= ((data.radiance >= lo) &
                             (data.radiance <= hi)).to_numpy()
                elif masktype.startswith('minalt'):
                    minalt = float(masktype[6:])
                    mask &= (data.alttan >= minalt).to_numpy()
                elif masktype.startswith('minsnr'):
                    minsnr = float(masktype[6:])
                    mask &= ((data.radiance / data.sigma) > minsnr).to_numpy()
                elif masktype.startswith('siglimit'):
                    sigmalimit = float(masktype[8:])
                else:
                    raise ValueError(f'masking = {masktype} not defined.')
        return mask, sigmalimit

    # ------------------------------------------------------------ simulate
    def simulate_data_from_inputs(self, scdata, overwrite=False):
        """Compute (or restore) the LOS model for every output file and fit
        the source rate against the data."""
        if (self.inputs.spatialdist.type == 'surface map' and
                getattr(self.inputs.spatialdist, 'coordinate_system', '') ==
                'planet-fixed'):
            self.inputs.spatialdist.subsolarlon = float(
                np.median(scdata.subslong))

        (self.outid, self.outputfiles, self.npackets,
         self.totalsource) = self.inputs.search()
        print(f'LOSResult: {len(self.outid)} output files found.')
        if self.npackets == 0:
            raise RuntimeError('No packets found for these Inputs.')

        search_results = self.search_iterations()
        while None in search_results.values():
            ntodo = list(search_results.values()).count(None)
            print(f'LOSResult: {ntodo} to compute')
            for outputfile, found in search_results.items():
                if found is None:
                    compute_iteration(self, outputfile, scdata)
            search_results = self.search_iterations()

        iteration_results = []
        for outputfile, found in search_results.items():
            result = self.restore_iteration(found)
            if len(result.radiance) != len(scdata.data):
                raise RuntimeError('cached LOS model does not match the '
                                   'spacecraft dataset')
            iteration_results.append(result)

        self.modelfiles = {}
        radiance = np.zeros(len(scdata.data))
        npackets_los = np.zeros(len(scdata.data), dtype=int)
        for result in iteration_results:
            radiance += np.asarray(result.radiance)
            npackets_los += np.asarray(result.npackets)
            self.modelfiles[result.outputfile] = result.modelfile
        self.radiance = pd.Series(radiance, index=scdata.data.index)
        self.npackets_los = pd.Series(npackets_los, index=scdata.data.index)

        model_rate = self.totalsource / self.inputs.options.endtime
        self.atoms_per_packet = 1e23 / model_rate
        self.radiance *= self.atoms_per_packet / 1e3   # -> kR
        self.determine_source_rate(scdata, use_weight=False)
        self.outputfiles = list(self.modelfiles.keys())
        print(f'totalsource = {self.totalsource}, '
              f'atoms/packet = {self.atoms_per_packet}')

    def determine_source_rate(self, scdata, use_weight=True):
        """Weighted linear LSQ of model radiance onto data radiance.

        factor = sum(w m d) / sum(w m^2) — the closed form of the reference's
        astropy Multiply model fit (``LOSResult.py:278-308``)."""
        data = scdata.data
        mask, sigmalimit = self.make_mask(data)
        weights = (1.0 / data.sigma.to_numpy() ** 2 if use_weight
                   else np.ones(len(data)))

        model = self.radiance.to_numpy()
        obs = data.radiance.to_numpy()

        def fit(m):
            denom = np.sum(weights[m] * model[m] ** 2)
            if denom == 0:
                return 0.0
            return float(np.sum(weights[m] * model[m] * obs[m]) / denom)

        if not np.all(model == 0):
            factor = fit(mask)
            if sigmalimit is not None:
                diff = np.abs((obs - factor * model) /
                              data.sigma.to_numpy())
                mask = mask & (diff < sigmalimit)
                factor = fit(mask)
            self.radiance = self.radiance * factor
            self.sourcerate = factor         # x 1e23 atoms/s
        else:
            self.sourcerate = 0.0
        self.goodness_of_fit = None
        self.mask = mask

    # ---------------------------------------------------------- source maps
    def make_source_map(self, grid_params=None, normalize=True,
                        do_source=True, do_available=True):
        """Histogram the initial states of all runs into SourceMaps (the
        'source' = frac-weighted, 'available' = unweighted views), corrected
        by the observed fraction.  See
        :func:`nexoclom_tpu.data_simulation.make_source_map.make_source_map`.
        """
        from nexoclom_tpu.data_simulation.make_source_map import (
            build_sourcemap_from_outputs)
        sourcemap = availablemap = None
        if do_source:
            sourcemap = build_sourcemap_from_outputs(
                self, grid_params, todo='source', normalize=normalize)
        if do_available:
            availablemap = build_sourcemap_from_outputs(
                self, grid_params, todo='available', normalize=normalize)
        self.sourcemap = sourcemap
        return sourcemap, availablemap
