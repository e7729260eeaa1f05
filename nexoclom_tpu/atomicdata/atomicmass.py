"""Atomic and molecular masses.

Replaces the reference's ``periodictable`` dependency
(``nexoclom/atomicdata/atomicmass.py:5-51``) with a vendored table of CIAAW
standard atomic weights and a small formula parser supporting the species
grammar used throughout the reference data tables:

* plain elements: ``Na``, ``Ca``
* ions (trailing ``+``, electron mass neglected): ``Mg+``, ``Ca+``
* molecules with ``_n`` counts: ``H_2O``, ``CO_2``, ``CH_4``
* parenthesised groups written with ``=``: ``Ca=OH=_2`` == Ca(OH)2

Returns the mass in AMU as a plain float (the reference returned an astropy
quantity in AMU; all call sites in this package work in AMU floats and convert
with :data:`nexoclom_tpu.constants.ATOMIC_MASS_UNIT`).
"""
from __future__ import annotations

import re

# CIAAW 2021 standard atomic weights (conventional values).
ATOMIC_WEIGHTS = {
    'H': 1.008, 'He': 4.002602, 'Li': 6.94, 'Be': 9.0121831, 'B': 10.81,
    'C': 12.011, 'N': 14.007, 'O': 15.999, 'F': 18.998403163, 'Ne': 20.1797,
    'Na': 22.98976928, 'Mg': 24.305, 'Al': 26.9815384, 'Si': 28.085,
    'P': 30.973761998, 'S': 32.06, 'Cl': 35.45, 'Ar': 39.95,
    'K': 39.0983, 'Ca': 40.078, 'Sc': 44.955907, 'Ti': 47.867,
    'V': 50.9415, 'Cr': 51.9961, 'Mn': 54.938043, 'Fe': 55.845,
    'Co': 58.933194, 'Ni': 58.6934, 'Cu': 63.546, 'Zn': 65.38,
}

_TOKEN = re.compile(r'([A-Z][a-z]?)(?:_(\d+))?')


def _parse_plain(formula: str) -> float:
    """Mass of a formula without group delimiters, e.g. ``H_2O`` or ``CH_4``."""
    mass = 0.0
    pos = 0
    while pos < len(formula):
        m = _TOKEN.match(formula, pos)
        if m is None or m.group(1) not in ATOMIC_WEIGHTS:
            # Two-letter match may have swallowed the start of the next token
            # (not possible with this element set), or unknown symbol.
            raise ValueError(f'cannot parse species formula {formula!r}')
        count = int(m.group(2)) if m.group(2) else 1
        mass += ATOMIC_WEIGHTS[m.group(1)] * count
        pos = m.end()
    return mass


def atomicmass(species: str):
    """Return the mass of *species* in AMU, or ``None`` if unknown.

    Mirrors the behaviour of the reference ``atomicmass()`` (warn and return
    ``None`` for unknown species) so callers can keep identical error paths.
    """
    species = species.strip()
    charge = species.endswith('+')
    if charge:
        species = species[:-1]

    try:
        if '=' in species:
            # Grammar: A=BC=_n -> A + n * BC  (e.g. Ca=OH=_2)
            m = re.fullmatch(r'([A-Za-z_0-9]*)=([A-Za-z_0-9]+)=(?:_(\d+))?',
                             species)
            if m is None:
                raise ValueError(species)
            head = _parse_plain(m.group(1)) if m.group(1) else 0.0
            group = _parse_plain(m.group(2))
            count = int(m.group(3)) if m.group(3) else 1
            return head + group * count
        return _parse_plain(species)
    except ValueError:
        print(f'WARNING: atomicmass: {species} not found')
        return None
