"""Run catalog: JSON manifests + array files.

Replaces the reference's PostgreSQL catalog (17 tables created from
``nexoclom/data/schema.sql`` and the per-section ``search()``/``insert()``
methods in ``input_classes.py``) with three JSON manifests under the
configured ``savepath``:

* ``outputs.json``    — one record per simulated Output (replaces the
  ``outputfile`` table + the seven per-section tables; section parameters are
  embedded as the canonical inputs dict)
* ``losmodels.json``  — LOS iteration results (replaces ``uvvsmodels``)
* ``images.json``     — model images (replaces ``modelimages``)

Matching semantics are preserved, including the true-anomaly tolerance: two
runs match when every input parameter is equal except ``geometry.taa``, which
must agree within +/-0.5 deg with nearest-TAA tie-breaking
(``input_classes.py:16,225-246``).

Writes are serialised with an ``fcntl`` file lock so concurrent host
processes (the replacement for the reference's Condor workers sharing one
database) can append safely.
"""
from __future__ import annotations

import fcntl
import json
import math
import os
from contextlib import contextmanager
from datetime import datetime, timezone

from nexoclom_tpu.constants import TAA_MATCH_WIDTH as DTAA


class _JsonStore:
    """A locked JSON manifest of records with monotonically increasing ids."""

    def __init__(self, path: str):
        self.path = path

    @contextmanager
    def _locked(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        lockpath = self.path + '.lock'
        with open(lockpath, 'w') as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {'next_id': 1, 'records': []}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, data: dict):
        tmp = self.path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self.path)

    def records(self) -> list[dict]:
        return self._read()['records']

    def insert(self, record: dict) -> int:
        with self._locked():
            data = self._read()
            record = dict(record)
            record['idnum'] = data['next_id']
            record['created'] = datetime.now(timezone.utc).isoformat()
            data['next_id'] += 1
            data['records'].append(record)
            self._write(data)
            return record['idnum']

    def update(self, idnum: int, **fields):
        with self._locked():
            data = self._read()
            for record in data['records']:
                if record['idnum'] == idnum:
                    record.update(fields)
            self._write(data)

    def delete(self, idnums) -> list[dict]:
        """Remove records by id; returns the removed records."""
        idnums = set(idnums)
        with self._locked():
            data = self._read()
            removed = [r for r in data['records'] if r['idnum'] in idnums]
            data['records'] = [r for r in data['records']
                               if r['idnum'] not in idnums]
            self._write(data)
            return removed


def _match_inputs(record_inputs: dict, inputs: dict):
    """Reference-style run matching.  Returns None for no match, or the
    absolute TAA difference (0.0 for exact geometry matches)."""
    for section, params in inputs.items():
        rec = record_inputs.get(section)
        if rec is None:
            return None
        if section == 'geometry' and 'taa' in params:
            for key, value in params.items():
                if key == 'taa':
                    continue
                if rec.get(key) != value:
                    return None
            dtaa = abs(rec.get('taa', 0.0) - params['taa'])
            dtaa = min(dtaa, 2 * math.pi - dtaa)
            if dtaa >= DTAA / 2:
                return None
        elif rec != params:
            return None
    # the tie-break distance must use the same 0/2pi wrap as the match
    # test, or records across the seam lose (or mask) the tie-break
    dtaa = abs(record_inputs.get('geometry', {}).get('taa', 0.0) -
               inputs.get('geometry', {}).get('taa', 0.0))
    return min(dtaa, 2 * math.pi - dtaa)


class Catalog:
    """The savepath-scoped run catalog."""

    def __init__(self, savepath: str):
        self.savepath = savepath
        self.outputs = _JsonStore(os.path.join(savepath, 'outputs.json'))
        self.losmodels = _JsonStore(os.path.join(savepath, 'losmodels.json'))
        self.images = _JsonStore(os.path.join(savepath, 'images.json'))

    # ------------------------------------------------------------------ runs
    def search_outputs(self, inputs: dict) -> list[dict]:
        """All output records matching ``inputs`` (canonical section dicts),
        with TAA-tolerance + nearest-TAA tie-break semantics."""
        matches = []
        for record in self.outputs.records():
            # records whose array file was never finalised (crash between
            # the catalog insert and the npz write, or another host still
            # saving) do not count as completed work — resume re-runs them
            # and readers never try to np.load a missing path
            filename = record.get('filename')
            if filename is None or not os.path.exists(filename):
                continue
            dtaa = _match_inputs(record['inputs'], inputs)
            if dtaa is not None:
                matches.append((dtaa, record))
        if not matches:
            return []
        best = min(d for d, _ in matches)
        # all records sharing the nearest stored TAA value
        return [r for d, r in matches if math.isclose(d, best, abs_tol=1e-12)]

    def output_filename(self, idnum: int, inputs: dict) -> str:
        """Mirror the reference's directory layout
        (``Output.make_filename``, ``Output.py:457-478``)."""
        geometry = inputs['geometry']
        options = inputs['options']
        taastr = '{:03.0f}'.format(round(math.degrees(
            geometry.get('taa', 0.0))))
        pathname = os.path.join(self.savepath, geometry['planet'],
                                options['species'],
                                inputs['spatialdist']['type'],
                                inputs['speeddist']['type'], taastr)
        os.makedirs(pathname, exist_ok=True)
        return os.path.join(pathname, f'{idnum:010d}.npz')

    def insert_output(self, inputs: dict, npackets: int,
                      totalsource: float) -> tuple[int, str]:
        idnum = self.outputs.insert({'filename': None,
                                     'npackets': int(npackets),
                                     'totalsource': float(totalsource),
                                     'inputs': inputs})
        filename = self.output_filename(idnum, inputs)
        self.outputs.update(idnum, filename=filename)
        return idnum, filename

    def delete_outputs(self, idnums) -> list[str]:
        """Cascade delete: outputs, dependent LOS models / images / fitted
        outputs (parity with ``Input.delete_files``, ``Input.py:274-425``).
        Returns paths of files to remove (caller deletes)."""
        idnums = set(int(i) for i in idnums)
        files: list[str] = []

        # fitted outputs derived from these runs
        fitted_ids = set()
        for record in self.outputs.records():
            spat = record['inputs'].get('spatialdist', {})
            spd = record['inputs'].get('speeddist', {})
            if (spat.get('type') == 'fitted output' and
                    spat.get('unfit_outid') in idnums) or \
               (spd.get('type') == 'fitted output' and
                    spd.get('unfit_outid') in idnums):
                fitted_ids.add(record['idnum'])
        all_ids = idnums | fitted_ids

        for record in self.outputs.delete(all_ids):
            if record.get('filename'):
                files.append(record['filename'])

        los_ids = [r['idnum'] for r in self.losmodels.records()
                   if r.get('out_idnum') in all_ids or
                   r.get('unfit_idnum') in all_ids]
        for record in self.losmodels.delete(los_ids):
            if record.get('filename'):
                files.append(record['filename'])

        image_ids = [r['idnum'] for r in self.images.records()
                     if r.get('out_idnum') in all_ids]
        for record in self.images.delete(image_ids):
            if record.get('filename'):
                files.append(record['filename'])
        return files

    # ------------------------------------------------------- derived results
    def search_losmodels(self, **criteria) -> list[dict]:
        return [r for r in self.losmodels.records()
                if all(r.get(k) == v for k, v in criteria.items())]

    def insert_losmodel(self, **record) -> int:
        return self.losmodels.insert(record)

    def search_images(self, **criteria) -> list[dict]:
        return [r for r in self.images.records()
                if all(r.get(k) == v for k, v in criteria.items())]

    def insert_image(self, **record) -> int:
        return self.images.insert(record)


def get_catalog() -> Catalog:
    """Catalog bound to the configured savepath."""
    from nexoclom_tpu.utilities.config import get_config
    config = get_config()
    config.ensure_savepath()
    return Catalog(config.savepath)
