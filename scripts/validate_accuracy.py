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
  fit     (80k packets, CPU f32 vs f64) sourcerate 5.9% / fitted 3.1% /
          map total 2.4% — against a perturbation-bootstrap MC floor of
          5.0% (diff/floor = 1.18 / 0.63 / 0.26): statistically
          indistinguishable from sampling noise, no f32 bias.  The
          bootstrap floor is validated against a 5-seed f64 engine-run
          population (scripts/_fit_seed_sweep.py): measured relstd
          5.4% vs bootstrap 5.0%.  The per-spectrum model radiances
          decorrelate ~54% rms between seeds AND between f32/f64
          (identical magnitudes), so the retrieval scalars inherit a
          few-percent MC floor at protocol counts; a single reseed diff
          samples that floor ONCE (measured 0.15% for the source rate —
          36x below the validated floor) and must not be read as the
          floor itself.  A 10-vs-10 seed study (_fit_seed_sweep.py, 80k
          packets): unfit sourcerate medians agree to 0.07%
          (Mann-Whitney p=0.73 — unbiased); fitted sourcerate medians
          differ +2.2% (p=0.031, ~2 sigma uncorrected — at most a ~2%
          effect, below the MC floor, unresolvable without O(100)
          engine runs).  The f64 population also drew a 4x sourcerate
          outlier (seed +8): the 3-spectra-dominated weighted LSQ is
          heavy-tailed, which is WHY the floor must come from the
          perturbation bootstrap and not from one reseed draw.
  fit-stage  (round 5) the COMMON-RANDOM-NUMBERS decomposition that
          settles the fit case's open question: one f64 engine catalog,
          retrieval chain forced to f32 vs f64 on the SAME packets
          (LOSResult(compute_dtype=...)).  No MC floor applies.
          Measured at 80k packets: sourcerate 7.2e-4, fitted
          sourcerate 1.2e-3, map total 1.2e-3 (2.1e-4/6.2e-5/8.0e-5 at
          20k) — the retrieval stage is ~10x inside the 1% target, so
          the fit case's 5.9% full-chain diff is engine MC
          decorrelation (already floor-bounded), not f32 retrieval
          bias.
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
                 'fit': 20000, 'fit-stage': 80000}


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
            'map': np.asarray(smap.abundance, float),
            # per-spectrum vectors for the bootstrap MC floor (the model
            # column's overall scale cancels in the LSQ ratio chain)
            'spectra': (unfit.radiance.to_numpy(),
                        scdata.data.radiance.to_numpy(),
                        scdata.data.sigma.to_numpy())}


def run_fit_stage_case(npackets, seed=SEED):
    """Common-random-numbers decomposition of the fit case (round-5
    verdict item 3): ONE f64 engine catalog, then the FULL retrieval
    chain (LOS reduce -> LSQ source rate -> fitted reweighting -> fitted
    map) twice on the SAME saved packets — device kernels forced to f32
    vs f64 via ``LOSResult(compute_dtype=...)``.  Identical inputs mean
    NO Monte Carlo floor applies: any difference is pure retrieval-stage
    f32 rounding (the reference computes these paths in f64,
    LOSResult.py:278-308, LOSResultFitted.py:136-227).  The engine-stage
    f32 effect is bounded separately by the image cases (it is MC-floor
    dominated, see the fit case notes above).
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
    savepath = tempfile.mkdtemp(prefix='nxt_acc_fitstage_')
    set_config(NexoclomConfig(savepath=savepath, precision='float64'))
    inp = Input(os.path.join(here, '..', 'tests', 'data', 'inputfiles',
                             'mercury_ca_spot.input'))
    inp.options.endtime = 2400.0
    inp.run(npackets, seed=seed)

    orbit = pd.read_csv(os.path.join(here, '..', 'tests', 'data', 'orbits',
                                     'messenger_like_orbit.csv'))
    out = {}
    for dt in ('float64', 'float32'):
        scdata = SpacecraftData(orbit, species='Ca')
        label = f'accst_{dt}'
        unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                          dphi=math.radians(1.0), label=label,
                          compute_dtype=dt)
        unfit.simulate_data_from_inputs(scdata)
        unfit.determine_source_rate(scdata)
        fitted = LOSResultFitted(scdata, label, {'quantity': 'radiance'},
                                 compute_dtype=dt)
        fitted.determine_source_from_data(scdata)
        smap, _ = fitted.make_source_map(do_available=False)
        out[dt] = {'sourcerate': float(unfit.sourcerate),
                   'fitted_sourcerate': float(fitted.sourcerate),
                   'map': np.asarray(smap.abundance, float)}
    return out


def bootstrap_fit_floor(model_a, model_b, obs, sigma, nboot=4000, seed=0):
    """Monte Carlo rel-std of the two-stage LSQ source rate, by
    per-spectrum perturbation.

    The per-spectrum model radiances fluctuate ~50% rms between seeds at
    protocol packet counts (narrow 1-degree cones, 1/d^2 weighting ->
    small effective sample per spectrum), so the fitted scalar inherits
    a few-percent MC floor — and a SINGLE reseed diff is itself one draw
    from that distribution (measured: one reseed moved the source rate
    0.15% while the floor is ~3%).  The weighted fit is dominated by a
    handful of low-sigma spectra (87% of sum(w m^2) in the top 3 on the
    protocol orbit), so spectrum-RESAMPLING bootstraps are invalid
    (n_eff ~ 3 gives an 80% pseudo-floor).  Instead, each spectrum's
    model value is perturbed independently at its own seed-to-seed
    fluctuation scale eta_s = |m_B - m_A| / sqrt(2) (a one-draw scale
    estimate — noisy per spectrum, unbiased in aggregate) and the exact
    two-stage fit chain reruns on the perturbed vector.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    a = np.asarray(model_a, float)
    b = np.asarray(model_b, float)
    obs = np.asarray(obs, float)
    w = 1.0 / np.asarray(sigma, float) ** 2
    eta = np.abs(b - a) / np.sqrt(2.0)

    def chain(m):
        f1 = np.sum(m * obs) / np.sum(m * m)        # use_weight=False pass
        m1 = f1 * m
        return np.sum(w * m1 * obs) / np.sum(w * m1 * m1)

    f0 = chain(a)
    n = len(a)
    draws = np.array([
        chain(np.maximum(a + eta * rng.standard_normal(n), 0.0))
        for _ in range(nboot)])
    return float(draws.std() / abs(f0))


def compare_fit(label, got, ref, target=0.01):
    """Compare the three retrieval products; returns {metric: rel diff}."""
    import numpy as np
    rels = {}
    for key in ('sourcerate', 'fitted_sourcerate'):
        rel = abs(got[key] - ref[key]) / abs(ref[key])
        rels[key] = rel
        verdict = (' (target < %g) -> %s'
                   % (target, 'PASS' if rel < target else 'FAIL')
                   if np.isfinite(target) else '')
        print(f'{label} {key}: {got[key]:.6e} vs {ref[key]:.6e}, '
              f'rel diff = {rel:.2e}{verdict}')
    # the fitted map integrates to the fitted source rate (normalize=True
    # semantics): its total is the science metric; per-bin diffs are
    # MC-migration dominated and reported informationally
    rels['map'] = compare(f'{label} fitted map (total abundance)',
                          got['map'], ref['map'], target=target)
    return rels


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
    parser.add_argument('--case', choices=[*CASES, 'fit', 'fit-stage',
                                           'all'],
                        default='all')
    parser.add_argument('--mc-floor', action='store_true',
                        help='also run a second-seed f64 case to measure '
                             'the Monte Carlo noise floor the f32 diff '
                             'should be compared against')
    args = parser.parse_args()
    cases = ([*CASES, 'fit', 'fit-stage'] if args.case == 'all'
             else [args.case])

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
        arrays['fit__spectra'] = np.stack(
            [np.asarray(v, float) for v in d['spectra']])

    def fit_from_arrays(arrays):
        d = {'sourcerate': float(arrays['fit__sourcerate']),
             'fitted_sourcerate': float(arrays['fit__fitted_sourcerate']),
             'map': np.asarray(arrays['fit__map'])}
        if 'fit__spectra' in arrays:
            d['spectra'] = tuple(arrays['fit__spectra'])
        return d

    if args.save_ref:
        arrays = {}
        for case in cases:
            if case == 'fit':
                fit_to_arrays(run_fit_case('float64', n_for(case)), arrays)
                # second-seed model column: the perturbation scale for
                # the bootstrap MC floor on the --compare side
                db = run_fit_case('float64', n_for(case), seed=SEED + 1)
                arrays['fit__model_b'] = np.asarray(db['spectra'][0], float)
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
                refd = fit_from_arrays(ref)
                rels = compare_fit(
                    f'fit: {jax.default_backend()} f32 vs saved f64',
                    got, refd, target=float('inf'))
                if 'spectra' in refd and 'fit__model_b' in ref.files:
                    boot = bootstrap_fit_floor(
                        refd['spectra'][0], ref['fit__model_b'],
                        refd['spectra'][1], refd['spectra'][2])
                    print(f'fit: bootstrap MC floor = {boot:.2e}; '
                          'diff/floor: ' + ', '.join(
                              f'{k}={rels[k] / boot:.2f}' for k in
                              ('sourcerate', 'fitted_sourcerate')))
            else:
                img32 = run_case(case, 'float32', n_case)
                compare(f'{case}: {jax.default_backend()} f32 vs saved f64',
                        img32, ref[case])
        return

    for case in cases:
        if case == 'fit-stage':
            d = run_fit_stage_case(n_for(case))
            rels = compare_fit(
                'fit-stage: f32 vs f64 retrieval, SAME engine packets '
                '(no MC floor applies)', d['float32'], d['float64'])
            continue
        if case == 'fit':
            d64 = run_fit_case('float64', n_for(case))
            d32 = run_fit_case('float32', n_for(case))
            # the fit scalars are MC-floor dominated at protocol packet
            # counts (bootstrap floor ~5% at 80k packets, shrinking as
            # 1/sqrt(N)): raw diffs are informational; judge via the
            # --mc-floor diff/floor ratios
            rels = compare_fit('fit: f32 vs f64 (same backend)', d32, d64,
                               target=float('inf'))
            if not args.mc_floor:
                print('fit: raw diffs are MC-noise dominated; rerun with '
                      '--mc-floor for the diff/floor verdicts')
            if args.mc_floor:
                d64b = run_fit_case('float64', n_for(case), seed=SEED + 1)
                floors = compare_fit('fit: f64 seed-B vs f64 seed-A '
                                     '(single-reseed floor draw)', d64b,
                                     d64, target=float('inf'))
                boot = bootstrap_fit_floor(
                    d64['spectra'][0], d64b['spectra'][0],
                    d64['spectra'][1], d64['spectra'][2])
                print(f'fit: sourcerate bootstrap MC floor = {boot:.2e} '
                      '(per-spectrum perturbation; one reseed diff is a '
                      'single draw from this distribution)')
                floors['sourcerate'] = max(floors['sourcerate'], boot)
                floors['fitted_sourcerate'] = max(
                    floors['fitted_sourcerate'], boot)
                for k, rel in rels.items():
                    print(f'fit: {k} f32 diff / MC floor = '
                          f'{rel / floors[k]:.2f} (<~1.4 = '
                          'indistinguishable from sampling noise)')
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
