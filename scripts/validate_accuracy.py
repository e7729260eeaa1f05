"""Accuracy validation: float32 (TPU) vs float64 brightness parity.

BASELINE.json's accuracy north-star is Ca brightness within 1% of the
reference model. The reference computes in float64; this build's TPU path
runs float32. This script bounds the float32 error on the Ca parity case by
comparing fused radiance images computed with identical threefry streams.

Modes:

  python scripts/validate_accuracy.py
      CPU: f64 vs f32 on the same backend (pure precision effect).

  python scripts/validate_accuracy.py --save-ref /tmp/ca_ref.npz
      CPU f64 run saved to disk.

  python scripts/validate_accuracy.py --tpu --compare /tmp/ca_ref.npz
      TPU f32 run compared against the saved CPU f64 reference
      (precision + backend effects combined).

Reported metrics: relative difference of disk-integrated brightness (the
target metric) and the p95 per-pixel relative difference over the top-half
signal (dominated by MC pixel migration, informational only).

Cases (--case, default all):
  ca      Ca spot, full sticking, gravity+photo (the BASELINE case)
  na      Na spot — radiation-pressure dominated, the hardest f32 species
  bounce  Na with temperature-dependent sticking + 0.5 accommodation
  io      Na from Io (satellite source): moving-moon launch, moon gravity
          + shadow, thermal re-emission from the moon (quirks F16/F21)
  fit     the RETRIEVAL science products end to end on the MESSENGER-like
          orbit: unfit LSQ source rate (LOSResult.py:278-308 role), fitted
          source rate (LOSResultFitted.py:136-227 role), and the fitted
          source map — scalar/map accuracy instead of image accuracy

Measured (2026-08, CPU f32 vs f64 total brightness):
  ca      0.34% (20k packets)
  na      0.11% at 80k packets (1.65% at 20k — that is decorrelation noise,
          not bias: the MC floor itself is 0.53%, f32/floor = 0.21)
  bounce  0.84% at 80k packets, MC floor 0.95%, f32/floor = 0.89
  io      0.38% at 20k packets, MC floor 0.84%, f32/floor = 0.46
All < 1%.  Cross-backend (TPU f32 vs saved CPU f64, per-case protocol
counts, late round-3 engine): ca 0.46%, na 0.08%, bounce 0.79%,
io 0.40% — all PASS.
For the radpres-dominated cases always compare against the --mc-floor
output: f32 vs f64 images differ like independent MC draws.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

PARAMS = {'quantity': 'radiance', 'dims': '64,64', 'width': '8,8'}
# Io orbits at 5.9 R_J: the satellite case needs a field wide enough to
# contain the moon's neighborhood
PARAMS_IO = {'quantity': 'radiance', 'dims': '64,64', 'width': '16,16'}
SEED = 20260816

def _io_moon_bounce(inputs):
    """Satellite source with thermal re-emission from Io (quirks F16/F21):
    moving-moon launch, moon gravity + shadow, co-moving-frame bounce."""
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    inputs.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'temperature dependent', 'accomfactor': '0.8'})
    inputs.options.step_size = 30.0


# case -> (inputfile, endtime override, mutate(inputs) or None, params)
CASES = {
    'ca': ('mercury_ca_spot.input', None, None, PARAMS),
    'na': ('mercury_na_spot.input', 10800.0, None, PARAMS),  # clip the 50k-s
                                                             # parity endtime:
                                                             # same physics,
                                                             # CPU-f64-feasible
    'bounce': ('mercury_na_bounce.input', None, None, PARAMS),
    'io': ('jupiter_io_satellite.input', 3600.0, _io_moon_bounce, PARAMS_IO),
}

# Default packet counts per case: the radpres-dominated Na cases need 80k
# to push the MC decorrelation floor below the 1% target (the f32/f64
# trajectories decorrelate chaotically and their images differ like
# independent draws — see the measured table above: na reads 1.65% at 20k
# from pure sampling noise and 0.11% at 80k).  --npackets overrides all.
CASE_NPACKETS = {'ca': 20000, 'na': 80000, 'bounce': 80000, 'io': 20000,
                 'fit': 20000}


def run_fit_case(dtype_name, npackets, seed=SEED):
    """Fitted-retrieval accuracy probe: the science quantities, not images.

    Runs the FULL retrieval stack on the MESSENGER-like orbit fixture —
    Input.run -> LOSResult -> weighted LSQ source rate -> LOSResultFitted
    per-packet reweighting -> fitted source rate + fitted source map —
    under a fresh temp catalog at the requested precision, and returns
    the three science products.  The reference computes these paths in
    f64 (LOSResult.py:278-308, LOSResultFitted.py:136-227); this bounds
    the f32 TPU error on them directly rather than inferring it from
    image parity.
    """
    import math
    import tempfile

    import numpy as np
    import pandas as pd

    from nexoclom_tpu.data_simulation import (LOSResult, LOSResultFitted,
                                              SpacecraftData)
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config

    here = os.path.dirname(os.path.abspath(__file__))
    savepath = tempfile.mkdtemp(prefix=f'nxt_acc_fit_{dtype_name}_')
    set_config(NexoclomConfig(savepath=savepath, precision=dtype_name))
    inp = Input(os.path.join(here, '..', 'tests', 'data', 'inputfiles',
                             'mercury_ca_spot.input'))
    inp.options.endtime = 2400.0
    inp.run(npackets, seed=seed)

    orbit = pd.read_csv(os.path.join(here, '..', 'tests', 'data', 'orbits',
                                     'messenger_like_orbit.csv'))
    scdata = SpacecraftData(orbit, species='Ca')
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                      dphi=math.radians(1.0), label='acc_unfit')
    unfit.simulate_data_from_inputs(scdata)
    unfit.determine_source_rate(scdata)

    fitted = LOSResultFitted(scdata, 'acc_unfit', {'quantity': 'radiance'})
    fitted.determine_source_from_data(scdata)
    smap, _ = fitted.make_source_map(do_available=False)
    return {'sourcerate': float(unfit.sourcerate),
            'fitted_sourcerate': float(fitted.sourcerate),
            'map': np.asarray(smap.abundance, float)}


def compare_fit(label, got, ref, target=0.01):
    """Compare the three retrieval products; returns the worst rel diff."""
    import numpy as np
    worst = 0.0
    for key in ('sourcerate', 'fitted_sourcerate'):
        rel = abs(got[key] - ref[key]) / abs(ref[key])
        worst = max(worst, rel)
        verdict = (' (target < %g) -> %s'
                   % (target, 'PASS' if rel < target else 'FAIL')
                   if np.isfinite(target) else '')
        print(f'{label} {key}: {got[key]:.6e} vs {ref[key]:.6e}, '
              f'rel diff = {rel:.2e}{verdict}')
    # the fitted map integrates to the fitted source rate (normalize=True
    # semantics): its total is the <1% science metric; per-bin diffs are
    # MC-migration dominated and reported informationally
    rel_map = compare(f'{label} fitted map (total abundance)',
                      got['map'], ref['map'], target=target)
    return max(worst, rel_map)


def run_case(case, dtype_name, npackets, seed=SEED):
    import jax.numpy as jnp
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    dtype = jnp.float64 if dtype_name == 'float64' else jnp.float32
    inputfile, endtime, mutate, params = CASES[case]
    inputs = Input(os.path.join(os.path.dirname(__file__), '..', 'tests',
                                'data', 'inputfiles', inputfile))
    if endtime is not None:
        inputs.options.endtime = endtime
    if mutate is not None:
        mutate(inputs)
    return fused_image_run(inputs, npackets, dict(params), seed=seed,
                           dtype=dtype).image


def compare(name, image_a, image_b, target=0.01):
    import numpy as np
    rel_total = abs(image_a.sum() - image_b.sum()) / image_b.sum()
    strong = image_b >= np.percentile(image_b[image_b > 0], 50)
    rel_pix = np.abs(image_a[strong] - image_b[strong]) / image_b[strong]
    if np.isfinite(target):
        verdict = (' (target < %g) -> %s'
                   % (target, 'PASS' if rel_total < target else 'FAIL'))
    else:
        verdict = ''
    print(f'{name}: total-brightness rel diff = {rel_total:.2e}{verdict}; '
          f'p95 per-pixel = {np.percentile(rel_pix, 95):.2e}')
    return rel_total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--npackets', type=int, default=None,
                    help='packets for every case (default: '
                         'per-case CASE_NPACKETS)')
    parser.add_argument('--tpu', action='store_true')
    parser.add_argument('--save-ref')
    parser.add_argument('--compare')
    parser.add_argument('--case', choices=[*CASES, 'fit', 'all'],
                        default='all')
    parser.add_argument('--mc-floor', action='store_true',
                        help='also run a second-seed f64 case to measure '
                             'the Monte Carlo noise floor the f32 diff '
                             'should be compared against')
    args = parser.parse_args()
    cases = [*CASES, 'fit'] if args.case == 'all' else [args.case]

    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np

    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_enable_x64', True)
    print('backend:', jax.default_backend())

    def n_for(case):
        return (args.npackets if args.npackets is not None
                else CASE_NPACKETS[case])

    def fit_to_arrays(d, arrays):
        arrays['fit__sourcerate'] = np.asarray(d['sourcerate'])
        arrays['fit__fitted_sourcerate'] = np.asarray(d['fitted_sourcerate'])
        arrays['fit__map'] = d['map']

    def fit_from_arrays(arrays):
        return {'sourcerate': float(arrays['fit__sourcerate']),
                'fitted_sourcerate': float(arrays['fit__fitted_sourcerate']),
                'map': np.asarray(arrays['fit__map'])}

    if args.save_ref:
        arrays = {}
        for case in cases:
            if case == 'fit':
                fit_to_arrays(run_fit_case('float64', n_for(case)), arrays)
            else:
                arrays[case] = run_case(case, 'float64', n_for(case))
            # record the packet count per case so --compare can reject a
            # reference computed at a different count (images differ like
            # independent MC draws — comparing across counts measures the
            # wrong noise floor)
            arrays[f'{case}__npackets'] = np.asarray(n_for(case))
        np.savez(args.save_ref, **arrays)
        print(f'saved f64 reference to {args.save_ref}')
        return

    if args.compare:
        ref = np.load(args.compare)
        for case in cases:
            n_case = n_for(case)
            n_key = f'{case}__npackets'
            if n_key in ref.files and int(ref[n_key]) != n_case:
                raise SystemExit(
                    f'{case}: reference {args.compare} was saved at '
                    f'{int(ref[n_key])} packets but this run uses {n_case}; '
                    f'regenerate with --save-ref (or pass --npackets '
                    f'{int(ref[n_key])})')
            if case == 'fit':
                got = run_fit_case('float32', n_case)
                compare_fit(f'fit: {jax.default_backend()} f32 vs saved '
                            'f64', got, fit_from_arrays(ref))
            else:
                img32 = run_case(case, 'float32', n_case)
                compare(f'{case}: {jax.default_backend()} f32 vs saved f64',
                        img32, ref[case])
        return

    for case in cases:
        if case == 'fit':
            d64 = run_fit_case('float64', n_for(case))
            d32 = run_fit_case('float32', n_for(case))
            rel = compare_fit('fit: f32 vs f64 (same backend)', d32, d64)
            if args.mc_floor:
                d64b = run_fit_case('float64', n_for(case), seed=SEED + 1)
                floor = compare_fit('fit: f64 seed-B vs f64 seed-A '
                                    '(MC floor)', d64b, d64,
                                    target=float('inf'))
                print(f'fit: f32 diff / MC floor = {rel / floor:.2f}')
            continue
        img64 = run_case(case, 'float64', n_for(case))
        img32 = run_case(case, 'float32', n_for(case))
        rel = compare(f'{case}: f32 vs f64 (same backend)', img32, img64)
        if args.mc_floor:
            # radiation-pressure trajectories are chaotic: f32 and f64
            # paths decorrelate, so their images differ like two
            # INDEPENDENT Monte Carlo draws of the same physics.  The
            # meaningful question is whether the f32 diff exceeds that MC
            # floor (a real f32 bias) or sits at it (pure sampling noise
            # that vanishes as 1/sqrt(N) at production packet counts).
            img64b = run_case(case, 'float64', n_for(case),
                              seed=SEED + 1)
            floor = compare(f'{case}: f64 seed-B vs f64 seed-A (MC floor)',
                            img64b, img64, target=float('inf'))
            print(f'{case}: f32 diff / MC floor = {rel / floor:.2f} '
                  f'(<~1.4 = statistically indistinguishable from '
                  f'sampling noise)')


if __name__ == '__main__':
    main()
