"""Solar-system body records.

Parity with ``nexoclom/solarsystem/SSObject.py``: the same planetary-constants
table (vendored as ``data/planetary_constants.csv``), the same sign convention
``GM = -mass * G`` (negative, so potential-energy terms appear with flipped
sign throughout the engine, see ``particle_tracking/bouncepackets.py:59``),
and the same recursive ``moons`` list.  Quantities are plain floats:
radius in km, mass in kg, ``a`` in AU (planets) or km (moons), tilt in
degrees, rotperiod in hours, orbperiod in days, GM in m^3/s^2.
"""
from __future__ import annotations

import csv
import functools
import os

from nexoclom_tpu.constants import GRAVITATIONAL_CONSTANT

_DATAPATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data')


@functools.lru_cache(maxsize=1)
def _load_constants():
    rows = {}
    with open(os.path.join(_DATAPATH, 'planetary_constants.csv')) as f:
        for row in csv.DictReader(f):
            rows[row['Object'].casefold()] = row
    return rows


class SSObject:
    """A star, planet, or moon with basic physical and orbital constants."""

    def __init__(self, obj: str):
        constants = _load_constants()
        row = constants.get(obj.casefold())
        if row is None:
            print(f'Object {obj} does not exist in table.')
            self.object = None
            return

        self.object = row['Object']
        self.orbits = row['orbits']
        self.radius = float(row['radius'])          # km
        self.mass = float(row['mass'])              # kg
        self.a = float(row['a'])                    # AU (planet) or km (moon)
        self.e = float(row['e'])
        self.tilt = float(row['tilt'])              # deg
        self.rotperiod = float(row['rot_period'])   # hr
        self.orbperiod = float(row['orb_period'])   # day
        # Negative by convention (see module docstring).
        self.GM = -self.mass * GRAVITATIONAL_CONSTANT  # m^3 / s^2

        moons = [SSObject(r['Object']) for r in constants.values()
                 if r['orbits'] == self.object]
        self.moons = moons if moons else None

        if self.orbits == 'Milky Way':
            self.type = 'Star'
        elif self.orbits == 'Sun':
            self.type = 'Planet'
        else:
            self.type = 'Moon'

    @property
    def gm_rp3(self) -> float:
        """GM in units of R_planet^3 / s^2 (model units; negative).

        Matches the reference's ``GM.to(unit**3/u.s**2)``
        (``particle_tracking/Output.py:105``).
        """
        radius_m = self.radius * 1e3
        return self.GM / radius_m ** 3

    def __len__(self):
        return 1 if self.moons is None else len(self.moons) + 1

    def __eq__(self, other):
        return isinstance(other, SSObject) and self.object == other.object

    def __hash__(self):
        return hash((self.object,))

    def __repr__(self):
        return f'SSObject({self.object!r})'

    def __str__(self):
        return (f'Object: {self.object}\n'
                f'Type = {self.type}\n'
                f'Orbits {self.orbits}\n'
                f'Radius = {self.radius:0.2f} km\n'
                f'Mass = {self.mass:0.2e} kg\n'
                f'a = {self.a:0.4f}\n'
                f'Eccentricity = {self.e:0.4f}\n'
                f'Tilt = {self.tilt:0.2f} deg\n'
                f'Rotation Period = {self.rotperiod:0.2f} hr\n'
                f'Orbital Period = {self.orbperiod:0.2f} day\n'
                f'GM = {self.GM:0.4e} m3/s2')
