"""Worker entry point for host-level fan-out.

Replaces the reference's two subprocess shims — ``python Output.py
tempfile.pkl`` (``Output.py:574-578``) and ``python LOS_wrapper.py argfile``
(``data_simulation/LOS_wrapper.py``) — with one module entry:

    python -m nexoclom_tpu.worker payload.json

Payload formats (JSON):

    {"task": "run",  "inputs": {...}, "npackets": N,
     "seed": ..., "packs_per_it": ..., "sharded": false}
    {"task": "los",  "inputs": {...}, "outputfile": "...",
     "scdata": "spacecraft.csv", "species": "...",
     "params": {...}, "dphi": radians, "sharded": false,
     "cull_block": null}     # null/absent = unset; 0 = explicit dense

``sharded: true`` spreads the packet axis over every device the worker
process sees (the same switch as ``Input.run``/``LOSResult``).

Workers cooperate through the shared file-locked catalog, so many of them
can be pointed at the same savepath (the Condor pattern).
"""
from __future__ import annotations

import json
import math
import os
import sys

# This environment preloads jax with the TPU plugin before user code runs,
# which silently ignores $JAX_PLATFORMS; honor it here so CPU-pinned workers
# don't contend for the accelerator.
_platforms = os.environ.get('JAX_PLATFORMS')
if _platforms:
    import jax
    try:
        jax.config.update('jax_platforms', _platforms)
    except Exception as exc:
        # a silently-ignored failure here would let a CPU-pinned worker
        # grab the TPU and contend with the parent (CLAUDE.md hazard)
        import sys
        print(f'worker: could not pin jax platform to {_platforms!r} '
              f'({exc}); refusing to run on an unintended backend',
              file=sys.stderr)
        raise


def run_payload(payload: dict) -> int:
    from nexoclom_tpu.initial_state.input_class import Input

    task = payload.get('task', 'run')
    inputs = Input.from_dict(payload['inputs'])

    if task == 'run':
        inputs.run(payload['npackets'], seed=payload.get('seed'),
                   packs_per_it=payload.get('packs_per_it'),
                   sharded=payload.get('sharded', False))
        return 0
    elif task == 'los':
        import pandas as pd
        from nexoclom_tpu.data_simulation.compute_iteration import (
            compute_iteration)
        from nexoclom_tpu.data_simulation.los_result import LOSResult
        from nexoclom_tpu.data_simulation.spacecraft_data import SpacecraftData
        data = pd.read_csv(payload['scdata'])
        scdata = SpacecraftData(data, species=payload['species'],
                                query=payload.get('query', ''))
        losresult = LOSResult(scdata, inputs,
                              payload.get('params', {'quantity': 'radiance'}),
                              dphi=payload.get('dphi', math.radians(1.0)),
                              sharded=payload.get('sharded', False),
                              cull_block=payload.get('cull_block', None))
        compute_iteration(losresult, payload['outputfile'], scdata)
        return 0
    raise ValueError(f'unknown worker task {task!r}')


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print('usage: python -m nexoclom_tpu.worker payload.json',
              file=sys.stderr)
        return 2
    with open(argv[0]) as f:
        payload = json.load(f)
    return run_payload(payload)


if __name__ == '__main__':
    raise SystemExit(main())
