"""Fit a model source rate to spacecraft limb-scan spectra.

The data-comparison chain the reference drives through MESSENGERuvvs:
``SpacecraftData.model(inputs, npackets)`` simulates any missing packets,
computes the line-of-sight radiance for every spectrum, and scales the
model onto the data by weighted least squares.  Uses the vendored
MESSENGER-like orbit fixture (real orbit shape, UVVS-style limb scans —
see scripts/make_messenger_orbit.py).

    python examples/messenger_fit.py [--packets 20000] [--tpu]
        [--savepath /tmp/nexoclom_tpu_examples]
"""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=20000)
    ap.add_argument('--tpu', action='store_true')
    ap.add_argument('--sharded', action='store_true',
                    help='shard the packet axis (run + LOS '
                         'reduction) over every local device')
    ap.add_argument('--cull', type=int, default=0, metavar='BLOCK',
                    help='two-stage LOS block cull at this block size '
                         '(exact; skips most packet tiles on these '
                         'sparse limb-scan cones — try 8192)')
    ap.add_argument('--savepath', default='/tmp/nexoclom_tpu_examples')
    args = ap.parse_args()

    os.makedirs(args.savepath, exist_ok=True)
    os.environ.setdefault('NEXOCLOM_SAVEPATH', args.savepath)
    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    import pandas as pd

    from nexoclom_tpu import Input
    from nexoclom_tpu.data_simulation import SpacecraftData

    here = os.path.dirname(os.path.abspath(__file__))
    orbit = pd.read_csv(os.path.join(here, '..', 'tests', 'data', 'orbits',
                                     'messenger_like_orbit.csv'))
    inputs = Input(os.path.join(here, '..', 'tests', 'data', 'inputfiles',
                                'mercury_na_spot.input'))

    scdata = SpacecraftData(orbit, species=inputs.options.species,
                            query='MESSENGER-like limb scans')
    result = scdata.model(inputs, args.packets, dphi=math.radians(1.0),
                          label='fit_demo', seed=11,
                          sharded=args.sharded, cull_block=args.cull)

    model = result.radiance.to_numpy()
    data = orbit.radiance.to_numpy()
    alt = orbit.alttan.to_numpy()
    print(f'{len(orbit)} spectra; fitted source rate '
          f'{result.sourcerate * 1e23:.3e} atoms/s')
    for lo, hi in ((0, 400), (400, 1000), (1000, 3000)):
        sel = (alt >= lo) & (alt < hi)
        print(f'  alttan {lo:4d}-{hi:4d} km: data {data[sel].mean():8.2f}, '
              f'model {model[sel].mean():8.2f} kR ({sel.sum()} spectra)')
    assert result.sourcerate > 0 and np.isfinite(result.sourcerate)
    print('OK')


if __name__ == '__main__':
    main()
