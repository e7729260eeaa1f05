"""Magnetic-coordinate hook for electron-impact loss.

Parity with ``nexoclom/particle_tracking/xyz_to_magcoord.py``: a placeholder
for mapping model coordinates into magnetospheric coordinates, the entry
point for future electron-impact and charge-exchange loss channels (the
reference's state function carries the same commented-out hooks,
``state.py:56-70``).  Returns None for Mercury (no mapping implemented) and
raises for other planets, matching the reference.
"""
from __future__ import annotations


def xyz_to_magcoord(t, x, inputs, planet: str):
    if planet == 'Mercury':
        return None
    raise NotImplementedError(
        f'magnetic coordinate transform not defined for {planet}')
