"""Debug-mode validation: the rebuild's sanitizer layer.

The reference's sanitizers are scattered runtime asserts (finiteness of
states, non-negative frac, step-size sanity — SURVEY.md section 5).  Here
they are collected into explicit host-side validators that run on demand (or
automatically when ``NEXOCLOM_DEBUG=1``), so the hot jitted path stays
assert-free while debugging keeps the same guarantees.
"""
from __future__ import annotations

import os

import numpy as np

# frac may exceed 1 when an RK step straddles the shadow boundary: the
# negative Butcher weights against the discontinuous ionization mask give an
# effective negative rate of up to ~0.32 x (kappa h).  For Ca at perihelion
# with 30 s steps that is ~0.7%; matches the reference's log-frac
# integration (rk5.py:25,49-50), which has no upper bound on frac at all.
FRAC_OVERSHOOT = 2e-2


def debug_enabled() -> bool:
    return os.environ.get('NEXOCLOM_DEBUG', '') not in ('', '0', 'false')


class ValidationError(AssertionError):
    pass


def _check(condition: bool, message: str):
    if not condition:
        raise ValidationError(message)


def validate_initial_state(x0: dict, exobase: float = 1.0,
                           satellite: bool = False, fitted: bool = False):
    """Initial-state invariants (source_distribution.py:33,187 asserts).

    ``satellite``: launches sit on the MOON's exobase at its orbital
    position, not the planet's — the planet-centric radius check does not
    apply.  ``fitted``: X0.frac is reweighted by the retrieval multiplier
    (los_fitted.py), so the frac == 1 launch invariant does not apply."""
    for name, column in x0.items():
        values = np.asarray(column)
        _check(np.all(np.isfinite(values)), f'non-finite X0 column {name}')
    if not satellite:
        r = np.sqrt(np.asarray(x0['x']) ** 2 + np.asarray(x0['y']) ** 2 +
                    np.asarray(x0['z']) ** 2)
        _check(np.allclose(r, exobase, atol=1e-5),
               'packets not launched from the exobase')
    if not fitted:
        _check(np.all(np.asarray(x0['frac']) == 1.0), 'initial frac != 1')
    else:
        _check(np.all(np.asarray(x0['frac']) >= 0), 'negative X0 frac')
    _check(np.all(np.asarray(x0['time']) >= 0), 'negative initial time')


def validate_packet_frame(frame, label: str = 'X', satellite: bool = False,
                          frac_ceiling: float | None = None):
    """Result-frame invariants (Output.py:284-291,388-389 asserts).

    ``frac_ceiling`` overrides the 1 + overshoot upper bound (fitted
    outputs reweight frac by the retrieval multiplier, which may
    exceed 1)."""
    for name in ('x', 'y', 'z', 'vx', 'vy', 'vz', 'frac'):
        values = frame[name].to_numpy()
        _check(np.all(np.isfinite(values)),
               f'non-finite values in {label}.{name}')
    frac = frame['frac'].to_numpy()
    _check(np.all(frac >= 0), f'negative frac in {label}')
    ceiling = (1.0 + FRAC_OVERSHOOT) if frac_ceiling is None else frac_ceiling
    _check(np.all(frac <= ceiling),
           f'frac exceeds the {ceiling:g} ceiling in {label}')
    live = frac > 0
    if live.any():
        r = np.sqrt(frame['x'].to_numpy() ** 2 + frame['y'].to_numpy() ** 2 +
                    frame['z'].to_numpy() ** 2)[live]
        _check(bool(np.all(r >= 1.0 - 1e-6)),
               f'live packets below the surface in {label}')


def validate_output(output):
    """Full Output validation (X0 + X + bookkeeping)."""
    geometry = output.inputs.geometry
    satellite = geometry.startpoint != geometry.planet.object
    fitted = (getattr(output.inputs.options, 'fitted', False)
              or getattr(output.inputs.spatialdist, 'type', '') ==
              'fitted output')
    if len(output.X0):
        validate_initial_state(
            {c: output.X0[c].to_numpy() for c in
             ('time', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac')},
            exobase=getattr(output.inputs.spatialdist, 'exobase', 1.0),
            satellite=satellite, fitted=fitted)
    if len(output.X):
        validate_packet_frame(
            output.X, satellite=satellite,
            frac_ceiling=np.inf if fitted else None)
    _check(output.totalsource > 0, 'non-positive totalsource')
    _check(output.npackets > 0, 'non-positive npackets')
