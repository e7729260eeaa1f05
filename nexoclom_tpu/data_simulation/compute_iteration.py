"""Compute one LOS iteration (one output file against one spacecraft
dataset) and persist it.

Parity with ``nexoclom/data_simulation/compute_iteration.py``, with the
KDTree cone search replaced by the batched device reduction in
:mod:`nexoclom_tpu.ops.los` (see that module for the inclusion-test parity
notes).  Results are cataloged in ``losmodels.json`` + an ``.npz`` beside the
output file (replacing the ``uvvsmodels`` table + model pickle).
"""
from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.ops.los import (los_geometry, los_reduce,
                                  los_reduce_culled, resolve_cull_block)
from nexoclom_tpu.parallel.mesh import resolve_packet_mesh, shard_padded
from nexoclom_tpu.particle_tracking.output import Output
from nexoclom_tpu.utilities.catalog import get_catalog

CM_PER_KM = 1.0e5


class IterationResult:
    """Radiance along every line of sight from one output file."""

    def __init__(self, iteration: dict, losresult):
        self.radiance = iteration['radiance']        # (S,) raw weight sums
        self.npackets = iteration['npackets']        # (S,) packets in view
        self.totalsource = iteration['totalsource']
        self.outputfile = iteration['outputfile']
        self.out_idnum = iteration['out_idnum']
        self.included = iteration['included']        # per-X0 bool
        self.used_packets = iteration.get('used_packets')  # per-X-row bool

        self.modelfile = None
        self.model_idnum = None
        self.fitted = losresult.fitted
        self.quantity = losresult.quantity
        self.query = losresult.query
        self.dphi = losresult.dphi
        self.mechanism = losresult.mechanism
        self.wavelength = losresult.wavelength
        self.compute_dtype = getattr(losresult, 'compute_dtype', None)

    def _record(self):
        ufit_id = getattr(self, 'unfit_outid', None)
        cdt = self.compute_dtype
        return dict(out_idnum=self.out_idnum, unfit_idnum=ufit_id,
                    quantity=self.quantity, query=self.query, dphi=self.dphi,
                    mechanism=list(self.mechanism or []),
                    wavelength=list(self.wavelength or []),
                    fitted=bool(self.fitted),
                    compute_dtype=None if cdt is None else str(cdt))

    def save_iteration(self):
        catalog = get_catalog()
        self.idnum = catalog.insert_losmodel(**self._record())
        self.modelfile = os.path.join(
            os.path.dirname(self.outputfile), f'model.{self.idnum}.npz')
        catalog.losmodels.update(self.idnum, filename=self.modelfile)

        arrays = {
            'radiance': np.asarray(self.radiance, np.float64),
            'npackets': np.asarray(self.npackets, np.int64),
            'included': np.asarray(self.included, bool),
            'meta': np.frombuffer(json.dumps({
                'totalsource': float(self.totalsource),
                'outputfile': self.outputfile,
                'out_idnum': int(self.out_idnum),
                'idnum': int(self.idnum),
                'fitted': bool(self.fitted),
                'unfit_outid': getattr(self, 'unfit_outid', None),
            }).encode(), dtype=np.uint8),
        }
        if self.used_packets is not None:
            arrays['used_packets'] = np.asarray(self.used_packets, bool)
        np.savez_compressed(self.modelfile, **arrays)
        print(f'Saved model file {self.modelfile}')

    @classmethod
    def load(cls, modelfile: str, losresult) -> 'IterationResult':
        with np.load(modelfile) as data:
            meta = json.loads(bytes(data['meta']).decode())
            iteration = {
                'radiance': data['radiance'],
                'npackets': data['npackets'],
                'included': data['included'],
                'used_packets': (data['used_packets']
                                 if 'used_packets' in data.files else None),
                'totalsource': meta['totalsource'],
                'outputfile': meta['outputfile'],
                'out_idnum': meta['out_idnum'],
            }
        if meta.get('fitted') and meta.get('unfit_outid') is not None:
            result = IterationResultFitted(
                {**iteration, 'unfit_outid': meta['unfit_outid'],
                 'unfit_outputfile': None, 'unfit_modelfile': None},
                losresult)
        else:
            result = cls(iteration, losresult)
        result.modelfile = modelfile
        result.model_idnum = meta['idnum']
        return result


class IterationResultFitted(IterationResult):
    def __init__(self, iteration, losresult):
        super().__init__(iteration, losresult)
        self.unfit_outputfile = iteration.get('unfit_outputfile')
        self.unfit_outid = iteration['unfit_outid']
        self.unfit_modelfile = iteration.get('unfit_modelfile')
        self.fitted = True


def _stage_tracer(prefix='compute_iteration'):
    """Per-call stage logger (active when NEXOCLOM_TRACE_STAGES is set),
    same decomposition idea as Output.stage_seconds."""
    if not os.environ.get('NEXOCLOM_TRACE_STAGES'):
        return lambda name: None
    from nexoclom_tpu.utilities.tracing import logger
    last = time.perf_counter()

    def mark(name):
        nonlocal last
        now = time.perf_counter()
        logger.info('%s stage %s: %.3f s', prefix, name, now - last)
        last = now
    return mark


def compute_iteration(losresult, outputfile: str, scdata) -> IterationResult:
    """Simulate one output file along every spacecraft line of sight."""
    t0 = time.time()
    mark = _stage_tracer()
    # only the LOS-relevant X columns (the full-frame restore dominates
    # the stage's wall time at production packet counts); X0 itself is
    # never needed here — its row count is the meta npackets
    output = Output.restore(
        outputfile, columns={'X': ('x', 'y', 'z', 'vy', 'frac', 'Index')})
    packets = output.X
    vr_model = output.vrplanet / losresult.radius_km
    mark('restore')

    radvel = packets['vy'].to_numpy() + vr_model
    weight = losresult.packet_weighting(packets['frac'].to_numpy(), radvel,
                                        output.aplanet)

    data = scdata.data
    sc_pos = data[['x', 'y', 'z']].to_numpy(dtype=float)
    bore = data[['xbore', 'ybore', 'zbore']].to_numpy(dtype=float)
    geometry = losresult.inputs.geometry
    moons = ()
    if geometry.startpoint != geometry.planet.object:
        # satellite runs: every included moon (at its observation-time
        # phase) occults lines of sight through its disk
        from nexoclom_tpu.initial_state.satellites import moon_occultors
        moons = moon_occultors(geometry)
    obstruction, outer_dd = los_geometry(
        sc_pos, bore, losresult.inputs.options.outeredge, moons=moons)

    cdt = getattr(losresult, 'compute_dtype', None)
    packet_arrays = (jnp.asarray(packets['x'].to_numpy(), dtype=cdt),
                     jnp.asarray(packets['y'].to_numpy(), dtype=cdt),
                     jnp.asarray(packets['z'].to_numpy(), dtype=cdt),
                     jnp.asarray(weight, dtype=cdt))
    n_rows = packets['x'].shape[0]
    spectra_args = (jnp.asarray(sc_pos, dtype=cdt),
                    jnp.asarray(bore, dtype=cdt),
                    jnp.asarray(obstruction, dtype=cdt),
                    jnp.asarray(outer_dd, dtype=cdt),
                    losresult.dphi, losresult.radius_km * CM_PER_KM)
    mesh = resolve_packet_mesh(getattr(losresult, 'sharded', False),
                               'compute_iteration')
    # None = unset: backend default (block 4096 on accelerators — the
    # measured-best round-5 ladder point — dense on CPU); explicit 0 =
    # dense opt-out.  Exact either way.
    cull_block = resolve_cull_block(getattr(losresult, 'cull_block', None))
    if cull_block and mesh is None:
        # two-stage block cull (exact; ops/los.py): sparse-cone orbits
        # skip most packet tiles per spectrum chunk
        rad, npack, used = los_reduce_culled(
            *packet_arrays, *spectra_args, quantity=losresult.quantity,
            block=cull_block)
    elif cull_block and mesh is not None:
        # per-shard cull under shard_map (same NaN/0 pad sentinels);
        # one psum pair joins the per-spectrum sums
        from nexoclom_tpu.ops.los import los_reduce_culled_sharded
        packet_arrays, pad = shard_padded(
            mesh, packet_arrays, (np.nan, 0.0, 0.0, 0.0))
        rad, npack, used = los_reduce_culled_sharded(
            *packet_arrays, *spectra_args, mesh,
            quantity=losresult.quantity, block=cull_block)
        used = used[:n_rows]
    elif mesh is not None:
        # packet axis over the mesh: per-spectrum sums cross shards (XLA
        # inserts the psum).  Pad sentinels: x=NaN poisons every distance/
        # angle comparison in the kernel to False — the row is out of view
        # for EVERY spectrum (including the npackets inview count; a 1e30
        # sentinel slipped past the default outeredge=1e30 cutoff in f64,
        # advisor round 3) — and weight=0 keeps it out of the used mask.
        packet_arrays, pad = shard_padded(
            mesh, packet_arrays, (np.nan, 0.0, 0.0, 0.0))
        with mesh:
            rad, npack, used = los_reduce(
                *packet_arrays, *spectra_args, quantity=losresult.quantity)
        used = used[:n_rows]
    else:
        rad, npack, used = los_reduce(
            *packet_arrays, *spectra_args, quantity=losresult.quantity)
    rad = np.asarray(rad)
    npack = np.asarray(npack)
    used = np.asarray(used)
    mark('kernel')

    # per-initial-packet inclusion flags (compute_iteration.py:145,191);
    # npackets == len(X0) by construction (one X0 row per launched packet)
    included = np.zeros(output.npackets, dtype=bool)
    packet_ids = packets['Index'].to_numpy().astype(int)
    included[packet_ids[used]] = True

    iteration = {
        'radiance': rad,
        'npackets': npack,
        'totalsource': output.totalsource,
        'outputfile': outputfile,
        'out_idnum': output.idnum,
        'included': included,
        'used_packets': used,
    }
    result = IterationResult(iteration, losresult)
    result.save_iteration()
    mark('save')
    print(f'Iteration time: {time.time() - t0:.1f} s '
          f'({len(data)} spectra x {len(packets)} packet rows)')
    return result
