"""The Input class: parse a model input file, find/reuse previous runs, and
drive new simulations.

Parity with ``nexoclom/initial_state/Input.py``:

* same plain-text grammar — ``section.param = value`` lines, ``;``/``#``
  comments, case-insensitive section and parameter names;
* ``search()`` returns ``(ids, filenames, total_packets, total_source)``
  against the catalog with the same TAA tolerance;
* ``run(npackets, ...)`` re-searches and only simulates the missing packet
  count, in chunks of ``packs_per_it`` (default 1e6 for the adaptive
  integrator, or a 1-GiB trajectory-array cap for constant step,
  ``Input.py:215-233``);
* ``delete_files()`` cascades through dependent LOS models / images / fitted
  outputs.

TPU-native difference: each chunk is one jitted device run (`Output`), and
chunking exists for HBM footprint and catalog-resume granularity rather than
host RAM.
"""
from __future__ import annotations

import os
import time

import numpy as np

from nexoclom_tpu.initial_state.sections import (AngularDist, Forces,
                                                 Geometry, Options,
                                                 SpatialDist, SpeedDist,
                                                 SurfaceInteraction)
from nexoclom_tpu.utilities.catalog import get_catalog

SECTION_CLASSES = {
    'geometry': Geometry,
    'surfaceinteraction': SurfaceInteraction,
    'forces': Forces,
    'spatialdist': SpatialDist,
    'speeddist': SpeedDist,
    'angulardist': AngularDist,
    'options': Options,
}


def parse_input_file(infile: str) -> dict[str, dict[str, str]]:
    """Parse ``section.param = value`` lines into nested dicts."""
    if not os.path.isfile(infile):
        raise FileNotFoundError(infile)
    sections: dict[str, dict[str, str]] = {}
    with open(infile) as f:
        for line in f:
            for comment in (';', '#'):
                if comment in line:
                    line = line[:line.find(comment)]
            if line.count('=') != 1:
                continue
            param, value = line.split('=')
            if param.count('.') != 1:
                continue
            section, key = param.split('.')
            sections.setdefault(section.casefold().strip(), {})[
                key.casefold().strip()] = value.strip()
    return sections


class Input:
    def __init__(self, infile: str):
        self._inputfile = infile
        params = parse_input_file(infile)
        self.geometry = Geometry(params.get('geometry', {}))
        self.surfaceinteraction = SurfaceInteraction(
            params.get('surfaceinteraction', {}))
        self.forces = Forces(params.get('forces', {}))
        self.spatialdist = SpatialDist(params.get('spatialdist', {}))
        self.speeddist = SpeedDist(params.get('speeddist', {}))
        self.angulardist = AngularDist(params.get('angulardist', {}))
        self.options = Options(params.get('options', {}))
        self._resolve_relative_files()

    def _resolve_relative_files(self):
        """Resolve relative map/distribution file paths against the input
        file's directory, so input files are location-independent.  (The
        reference resolves them against the process cwd — its own test
        fixture `SurfaceInteraction.06.input` names a bare
        `Orbit3576.Ca.pkl` that only loads when run from that directory.)
        Paths that already exist from the cwd are left untouched."""
        base = os.path.dirname(os.path.abspath(self._inputfile))
        for section, attr in ((self.spatialdist, 'mapfile'),
                              (self.speeddist, 'vdistfile'),
                              (self.surfaceinteraction, 'stick_mapfile'),
                              (self.options, 'eimp_profile')):
            path = getattr(section, attr, None)
            if (isinstance(path, str) and path not in ('', 'default')
                    and not os.path.isabs(path) and not os.path.exists(path)):
                candidate = os.path.join(base, path)
                if os.path.exists(candidate):
                    setattr(section, attr, candidate)

    @classmethod
    def from_sections(cls, geometry, surfaceinteraction, forces, spatialdist,
                      speeddist, angulardist, options) -> 'Input':
        """Build an Input programmatically (no file)."""
        inputs = cls.__new__(cls)
        inputs._inputfile = None
        inputs.geometry = geometry
        inputs.surfaceinteraction = surfaceinteraction
        inputs.forces = forces
        inputs.spatialdist = spatialdist
        inputs.speeddist = speeddist
        inputs.angulardist = angulardist
        inputs.options = options
        return inputs

    @classmethod
    def from_dict(cls, data: dict) -> 'Input':
        """Rebuild an Input from its canonical dict (Output.restore path)."""
        return cls.from_sections(
            Geometry.from_dict(data['geometry']),
            SurfaceInteraction.from_dict(data['surfaceinteraction']),
            Forces.from_dict(data['forces']),
            SpatialDist.from_dict(data['spatialdist']),
            SpeedDist.from_dict(data['speeddist']),
            AngularDist.from_dict(data['angulardist']),
            Options.from_dict(data['options']))

    # ------------------------------------------------------------- identity
    def _sections(self):
        return (self.geometry, self.surfaceinteraction, self.forces,
                self.spatialdist, self.speeddist, self.angulardist,
                self.options)

    def to_dict(self) -> dict:
        """Canonical nested dict (the catalog matching key)."""
        out = {s.section_name: s.to_dict() for s in self._sections()}
        # engine-semantics marker (quirk F21): satellite runs with a
        # bouncing surface interaction re-emit from the moon; earlier
        # catalog records (no marker) removed re-impacting packets, and
        # Input.run must never top up a bounce-semantics run with those
        # physically different outputs
        from nexoclom_tpu.initial_state.sections import surface_bounces
        if (self.geometry.startpoint != self.geometry.planet.object and
                surface_bounces(self.surfaceinteraction) and
                # surface-map sticking bounces on the PLANET only — moon
                # re-impacts remove (the map is planet-fixed), matching
                # engine_spec_from_inputs's moon_bounce gate
                self.surfaceinteraction.sticktype != 'surface map'):
            out['engine'] = {'moon_bounce': True}
        return out

    def __eq__(self, other):
        return isinstance(other, Input) and self.to_dict() == other.to_dict()

    def __repr__(self):
        return self.__str__()

    def __str__(self):
        return '\n'.join(str(s) for s in self._sections())

    # --------------------------------------------------------------- search
    def search(self):
        """Find previous runs with matching inputs.

        Returns ``(idnums, filenames, npackets_total, totalsource_total)``.
        """
        records = get_catalog().search_outputs(self.to_dict())
        if not records:
            return [], [], 0, 0.0
        return ([r['idnum'] for r in records],
                [r['filename'] for r in records],
                int(sum(r['npackets'] for r in records)),
                float(sum(r['totalsource'] for r in records)))

    # ------------------------------------------------------------------ run
    def run(self, npackets, packs_per_it=None, overwrite=False, compress=True,
            seed=None, dtype=None, sharded=False):
        """Simulate until ``npackets`` packets exist for these inputs.

        Runs are chunked (``packs_per_it`` per Output) and each chunk is
        cataloged, so interrupted sweeps resume where they left off.
        ``sharded=True`` spreads each chunk's packet axis over every
        local device (or pass a ``jax.sharding.Mesh``) — identical
        physics, one chip's worth of packets per device
        (docs/scaling.md Multi-chip).
        """
        from nexoclom_tpu.particle_tracking.output import Output

        t_start = time.time()
        self.last_run_stages = []
        if overwrite:
            self.delete_files()
            totalpackets = 0
            nexisting = 0
        else:
            _, outputfiles, totalpackets, _ = self.search()
            nexisting = len(outputfiles)
            print(f'Found {len(outputfiles)} files with {totalpackets} '
                  'packets.')

        npackets = int(npackets)
        ntodo = npackets - totalpackets
        chunk = packs_per_it
        # resume offset: completed chunks consumed seeds seed..seed+n-1;
        # restarting at the same seed would catalog bitwise-duplicate
        # packet sets (the reference passes ONE seed to every iteration,
        # Input.py:246 — deviation F18, docs/QUIRKS.md)
        it = nexisting
        while ntodo > 0:
            if chunk is None and self.options.step_size == 0:
                # large adaptive chunks engage the in-loop pool refill
                # (2.5e8 vs 2.0e8 accepted ps/s measured, docs/scaling.md):
                # 2^24 per chip — the measured pool configuration, 72
                # B/packet of device carry — capped at 2^26 so the host
                # X0/X frames stay a few GB
                n_chips = 1
                if sharded:
                    import jax as _jax
                    n_chips = (int(sharded.shape['packets'])
                               if hasattr(sharded, 'shape')
                               else len(_jax.devices()))
                chunk = min(1 << 26, (1 << 24) * n_chips)
            elif chunk is None:
                # 1-GiB float64 trajectory-array budget per chunk, matching
                # the reference's cap (Input.py:219-222)
                nsteps = int(np.ceil(self.options.endtime /
                                     self.options.step_size) + 1)
                chunk = int(np.ceil(1024 ** 3 / nsteps / 8))
            this_chunk = int(min(ntodo, chunk))
            nits = int(np.ceil(ntodo / this_chunk))
            print(f'Running {nits} iterations of {this_chunk} packets.')
            for _ in range(nits):
                it += 1
                t0 = time.time()
                chunk_seed = None if seed is None else seed + it - 1
                out = Output(self, this_chunk, compress=compress,
                             seed=chunk_seed, dtype=dtype, sharded=sharded)
                # per-chunk wall decomposition, surfaced for bench.py's
                # detail.e2e block and post-hoc analysis
                self.last_run_stages.append(dict(out.stage_seconds))
                print(f'Iteration {it} completed in '
                      f'{time.time() - t0:.1f} s.')
            _, outputfiles, totalpackets, _ = self.search()
            ntodo = npackets - totalpackets
        print(f'Model run completed in {time.time() - t_start:.1f} s; '
              f'{totalpackets} packets in {len(outputfiles)} files.')

    def produce_image(self, format_, overwrite=False, sharded=False):
        from nexoclom_tpu.data_simulation.model_image import ModelImage
        return ModelImage(self, format_, overwrite=overwrite,
                          sharded=sharded)

    def delete_files(self, filename=None):
        """Delete catalog records and files for these inputs (cascading
        through dependent images, LOS models, and fitted outputs)."""
        idnums, filenames, _, _ = self.search()
        if filename is not None:
            idnums = [i for i, f in zip(idnums, filenames) if f == filename]
        files = get_catalog().delete_outputs(idnums)
        for path in files:
            if path and os.path.exists(path):
                print(f'Removing file {path}')
                os.remove(path)
