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

import json
import os
import subprocess
import sys
import tempfile
import time


def run_sweep(inputs_list, npackets, njobs: int = 2, seed=None,
              packs_per_it=None, env=None):
    """Run several Input configurations in worker processes.

    Parity with ``Condor.submit``'s throttled fan-out (``Condor.py:21-105``):
    at most ``njobs`` workers at a time; results join through the shared
    catalog, so a re-run skips completed work.

    Returns the list of per-run exit codes.
    """
    payload_files = []
    for i, inputs in enumerate(inputs_list):
        payload = {'task': 'run', 'inputs': inputs.to_dict(),
                   'npackets': int(npackets),
                   'seed': None if seed is None else seed + i,
                   'packs_per_it': packs_per_it}
        handle = tempfile.NamedTemporaryFile('w', suffix='.json',
                                             delete=False)
        json.dump(payload, handle)
        handle.close()
        payload_files.append(handle.name)

    returncodes = [None] * len(inputs_list)
    active: list[tuple[int, subprocess.Popen]] = []
    try:
        queue = list(enumerate(payload_files))
        while queue or active:
            while queue and len(active) < njobs:
                idx, payload_file = queue.pop(0)
                proc = subprocess.Popen(
                    [sys.executable, '-m', 'nexoclom_tpu.worker',
                     payload_file],
                    env={**os.environ, **(env or {})})
                active.append((idx, proc))
            # reap ANY finished child (not FIFO: waiting on the oldest
            # would let one long job head-of-line-block refills and degrade
            # parallelism below njobs)
            while active:
                done = [(i, p) for i, p in active if p.poll() is not None]
                if done:
                    for idx, proc in done:
                        returncodes[idx] = proc.returncode
                        active.remove((idx, proc))
                    break
                time.sleep(0.2)
    finally:
        for path in payload_files:
            try:
                os.unlink(path)
            except OSError:
                pass
    return returncodes
