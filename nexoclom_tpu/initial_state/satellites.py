"""Satellite starting positions.

Parity with ``nexoclom/initial_state/satellite_initial_positions.py``: a
placeholder for initialising packets at a moon's orbital position (the
reference asserts 'Not set up' whenever a run includes moons,
``Output.py:153-155``).  Kept as the documented extension point for
moon-source runs (Io, Europa, Enceladus); the engine's geometry path raises
``NotImplementedError`` before reaching it, exactly like the reference.
"""
from __future__ import annotations


def satellite_initial_positions(inputs):
    raise NotImplementedError(
        'satellite starting positions are not implemented (parity with the '
        'reference, Output.py:153-155)')
