"""Satellite (moon) starting positions — WORKING here.

The reference declares moon sources in its grammar (``geometry.startpoint``,
``geometry.phi``) but its engine refuses them ('Satellite start points not
set up', ``Output.py:153-155``); this build runs them.  Semantics (quirk
F16, docs/QUIRKS.md):

* Packets launch from the startpoint moon's surface (moon-local lon/lat
  from the spatial distribution, exobase in moon radii) at the moon's
  orbital position and inherit its orbital velocity.
* The moon's orbit is circular in the planet's equatorial plane at radius
  ``a`` with period ``orb_period``; the orbital phase ``phi`` follows the
  model-frame longitude convention (phi=0 between planet and sun, i.e.
  sub-solar; increasing phi = direction of orbital motion = the same sense
  as increasing longitude).
* After launch the engine integrates in the PLANET's field (model units
  R_planet): the moon's own gravity and its shadow are neglected — valid
  for source speeds well above the moon's escape speed and packets that
  leave its vicinity (Io sputtering/volcanic cases); re-impact on the moon
  is likewise not modelled.
* ``geometry.phi`` entries map to the non-planet objects in the order they
  appear in ``geometry.objects`` in the input file (the reference never
  defines this mapping — its engine asserts first).

Satellite runs with ``geometry.starttime`` would need moon ephemerides
(epoch phases) that neither build vendors; they raise NotImplementedError.
"""
from __future__ import annotations

import math

import numpy as np


def moon_phi(geometry, name: str) -> float:
    """Orbital phase (rad) of moon ``name`` from geometry.phi."""
    from nexoclom_tpu.utilities.exceptions import InputError
    if geometry.type == 'geometry with starttime':
        raise NotImplementedError(
            'satellite start points with geometry.starttime need moon '
            'ephemerides; give geometry.phi instead')
    phi = geometry.phi
    if phi is None:
        raise InputError('moon_phi', 'geometry.phi was not specified.')
    order = getattr(geometry, '_moon_order', None)
    if not order:
        # catalog-restored geometry: input order is gone; single-moon runs
        # are unambiguous, multi-moon fall back to sorted names
        order = sorted(o.object for o in geometry.objects
                       if o.object != geometry.planet.object)
    if name not in order:
        raise InputError('moon_phi', f'{name} not among geometry objects '
                                     f'{order}')
    return float(phi[order.index(name)])


def satellite_orbit(planet, moon, phi: float):
    """Moon center position (R_planet) and orbital velocity (R_planet/s)
    in the solar-fixed model frame at phase ``phi``.

    Circular orbit: r = a (sin phi, -cos phi, 0),
    v = a*omega (cos phi, sin phi, 0) with omega = 2 pi / period.
    """
    a_rp = moon.a / planet.radius           # moon.a is km for moons
    omega = 2.0 * math.pi / (moon.orbperiod * 86400.0)
    center = a_rp * np.array([math.sin(phi), -math.cos(phi), 0.0])
    v_orb = a_rp * omega * np.array([math.cos(phi), math.sin(phi), 0.0])
    return center, v_orb


def satellite_start(geometry):
    """(center, v_orb, scale) for the startpoint moon: its model-frame
    position/velocity plus the moon-radius / planet-radius scale for the
    launch sphere.  Raises if the startpoint is the planet itself."""
    from nexoclom_tpu.utilities.exceptions import InputError
    name = geometry.startpoint
    if name == geometry.planet.object:
        raise InputError('satellite_start',
                         'startpoint is the planet, not a satellite')
    moon = next((o for o in geometry.objects if o.object == name), None)
    if moon is None:
        from nexoclom_tpu.solarsystem import SSObject
        moon = SSObject(name)
    phi = moon_phi(geometry, name)
    center, v_orb = satellite_orbit(geometry.planet, moon, phi)
    return center, v_orb, moon.radius / geometry.planet.radius


def satellite_initial_positions(inputs):
    """Back-compat shim for the reference's module name."""
    return satellite_start(inputs.geometry)
