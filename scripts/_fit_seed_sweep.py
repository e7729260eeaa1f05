"""Multi-seed fit-case sweep: ground truth for the retrieval MC floor.

Runs the fit accuracy case at several seeds in both precisions and prints
the population of source rates — the direct (engine-run) estimate of the
MC floor that scripts/validate_accuracy.py's perturbation bootstrap is
validated against.  Throwaway analysis driver; see validate_accuracy.py
for the shipped protocol.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))

from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

from validate_accuracy import SEED, run_fit_case

NPACKETS = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
OFFSETS = ([int(x) for x in sys.argv[2].split(',')] if len(sys.argv) > 2
           else list(range(5)))
OFFSETS32 = ([int(x) for x in sys.argv[3].split(',')] if len(sys.argv) > 3
             else OFFSETS[:3])

results = {}
for dtype, offs in (('float64', OFFSETS), ('float32', OFFSETS32)):
    for off in offs:
        d = run_fit_case(dtype, NPACKETS, seed=SEED + off)
        results[(dtype, off)] = d
        print(f'RESULT {dtype} seed={SEED + off} '
              f'sourcerate={d["sourcerate"]:.6e} '
              f'fitted={d["fitted_sourcerate"]:.6e} '
              f'maptotal={float(d["map"].sum()):.6e}', flush=True)

import numpy as np

for key in ('sourcerate', 'fitted_sourcerate'):
    v64 = np.array([results[('float64', o)][key] for o in OFFSETS])
    v32 = np.array([results[('float32', o)][key] for o in OFFSETS32])
    print(f'{key}: f64 mean {v64.mean():.6e} relstd {v64.std(ddof=1)/v64.mean():.4f} | '
          f'f32 mean {v32.mean():.6e} relstd {v32.std(ddof=1)/v32.mean():.4f} | '
          f'mean shift {(v32.mean()-v64.mean())/v64.mean():+.4f}')
