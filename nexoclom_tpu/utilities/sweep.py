"""Run sweeps: the scale-out layer.

The reference fans runs out as HTCondor jobs (``utilities/Condor.py``) or
(disabled) dask tasks, joined through the PostgreSQL catalog.  The TPU-native
replacements, in order of preference:

1. **On-device ensembles** — independent parameter sets advance inside one
   compiled program with the ensemble axis sharded over the mesh
   (:mod:`nexoclom_tpu.parallel.ensemble`).  Zero scheduling overhead; the
   right tool for parameter sweeps sharing one geometry.
2. **Chunked sequential** — ``Input.run`` already splits any packet count
   into catalog-resumable chunks; several hosts pointed at one shared
   ``savepath`` cooperate through the file-locked catalog exactly as Condor
   workers cooperated through postgres.
3. **Host process pool** — :func:`run_sweep` below: one worker process per
   Input (each owns the accelerator in turn, or runs CPU-only), throttled
   like ``Condor.submit``'s njobs.  Useful for many small heterogeneous
   configurations.

Multi-host TPU pods coordinate via ``jax.distributed.initialize()`` before
building the mesh; the catalog needs no changes (any shared filesystem).
"""
from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile


def _worker_script() -> str:
    return ('import pickle, sys\n'
            'from nexoclom_tpu.initial_state.input_class import Input\n'
            'with open(sys.argv[1], "rb") as f:\n'
            '    payload = pickle.load(f)\n'
            'inputs = Input.from_dict(payload["inputs"])\n'
            'inputs.run(payload["npackets"], seed=payload.get("seed"),\n'
            '           packs_per_it=payload.get("packs_per_it"))\n')


def run_sweep(inputs_list, npackets, njobs: int = 2, seed=None,
              packs_per_it=None, env=None):
    """Run several Input configurations in worker processes.

    Parity with ``Condor.submit``'s throttled fan-out (``Condor.py:21-105``):
    at most ``njobs`` workers at a time; results join through the shared
    catalog, so a re-run skips completed work.

    Returns the list of per-run exit codes.
    """
    jobs = []
    payload_files = []
    for i, inputs in enumerate(inputs_list):
        payload = {'inputs': inputs.to_dict(), 'npackets': int(npackets),
                   'seed': None if seed is None else seed + i,
                   'packs_per_it': packs_per_it}
        handle = tempfile.NamedTemporaryFile('wb', suffix='.pkl',
                                             delete=False)
        pickle.dump(payload, handle)
        handle.close()
        payload_files.append(handle.name)

    script = _worker_script()
    returncodes = [None] * len(inputs_list)
    active: list[tuple[int, subprocess.Popen]] = []
    try:
        queue = list(enumerate(payload_files))
        while queue or active:
            while queue and len(active) < njobs:
                idx, payload_file = queue.pop(0)
                proc = subprocess.Popen(
                    [sys.executable, '-c', script, payload_file],
                    env={**os.environ, **(env or {})})
                active.append((idx, proc))
            idx, proc = active.pop(0)
            returncodes[idx] = proc.wait()
    finally:
        for path in payload_files:
            try:
                os.unlink(path)
            except OSError:
                pass
    return returncodes
