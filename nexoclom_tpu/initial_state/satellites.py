"""Satellite (moon) starting positions — WORKING here.

The reference declares moon sources in its grammar (``geometry.startpoint``,
``geometry.phi``) but its engine refuses them ('Satellite start points not
set up', ``Output.py:153-155``); this build runs them.  Semantics (quirk
F16, docs/QUIRKS.md):

* Packets launch from the startpoint moon's surface (moon-local lon/lat
  from the spatial distribution, exobase in moon radii) at the moon's
  orbital position AT THEIR LAUNCH TIME and inherit its orbital velocity:
  a packet of age t was launched when the moon was at
  phi(t) = phi - omega * t (phi is the phase at observation, t = 0 — the
  steady-state-age convention of Output.py:136-139 extended to a moving
  source).
* The moon's orbit is circular in the planet's equatorial plane at radius
  ``a`` with period ``orb_period``; ``phi`` follows the REFERENCE'S
  DOCUMENTED convention (docs/nexoclom/inputfiles.rst:72-77): 0 =
  superior conjunction (anti-solar), pi/2 = over the dawn terminator;
  increasing phi = prograde orbital motion.
* After launch the engine integrates in the planet's field PLUS the
  moon's own time-dependent point-mass gravity; the moon's shadow
  cylinder blocks radiation pressure and photoionization
  (``EngineSpec.moon_shadow``); and packets that fall back onto the
  moving moon are removed (``moon_impact``) — essential for sub-escape
  sources (Io's v_esc = 2.6 km/s) — or thermally re-emitted when the
  surface interaction bounces (``moon_bounce``, quirk F21:
  ``ops/surface.bounce_moon_packets`` applies the planet-bounce physics
  in the moon's co-moving frame).
* ``geometry.phi`` entries map to the non-planet objects in the order they
  appear in ``geometry.objects`` in the input file (the reference never
  defines this mapping — its engine asserts first).

Satellite runs with ``geometry.starttime`` get their phases from the
vendored mean ephemeris (``solarsystem/moon_ephemeris.py``, quirk F24) —
Galilean moons and Earth's Moon; others raise NotImplementedError naming
the geometry.phi fallback.
"""
from __future__ import annotations

import math

import numpy as np


def moon_phi(geometry, name: str) -> float:
    """Orbital phase (rad) of moon ``name`` from geometry.phi."""
    from nexoclom_tpu.utilities.exceptions import InputError
    if geometry.type == 'geometry with starttime':
        # vendored mean ephemeris (quirk F24) — the reference's kernel
        # path is dead (load_kernels.py:27-39)
        from nexoclom_tpu.solarsystem.moon_ephemeris import (
            moon_phase_at_time)
        return moon_phase_at_time(geometry.time, geometry.planet, name)
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


def orbit_params(planet, moon):
    """(a_rp, omega): the moon's circular-orbit radius in planet radii and
    angular rate in rad/s — THE single source of these conversions
    (``moon.a`` is km for moons, ``orbperiod`` days)."""
    return (moon.a / planet.radius,
            2.0 * math.pi / (moon.orbperiod * 86400.0))


def satellite_orbit(planet, moon, phi: float):
    """Moon center position (R_planet) and orbital velocity (R_planet/s)
    in the solar-fixed model frame at phase ``phi``.

    The phi convention lives in ONE place —
    ``ops.integrator.orbit_state`` (reference inputfiles.rst:72-77: 0 =
    superior conjunction, pi/2 = dawn terminator, prograde).
    """
    from nexoclom_tpu.ops.integrator import orbit_state
    a_rp, omega = orbit_params(planet, moon)
    cx, cy, vx, vy = orbit_state(a_rp, omega, phi, xp=np)
    return np.array([cx, cy, 0.0]), np.array([vx, vy, 0.0])


def satellite_params(geometry):
    """Static scalars for the jitted moving-moon launch and engine moon
    terms: ``(a_rp, omega, phi_obs, moon_radius_rp, moon_gm_rp3)`` —
    semi-major axis and moon radius in R_planet, omega in rad/s, phase at
    observation (t = 0), and the moon's GM normalised by the PLANET radius
    cubed (same convention as ``SSObject.gm_rp3``, negative)."""
    name = geometry.startpoint
    moon = next((o for o in geometry.objects if o.object == name), None)
    if moon is None:
        from nexoclom_tpu.solarsystem import SSObject
        moon = SSObject(name)
    phi = moon_phi(geometry, name)
    planet = geometry.planet
    a_rp, omega = orbit_params(planet, moon)
    gm_rp3 = moon.GM / (planet.radius * 1000.0) ** 3
    return (a_rp, omega, phi, moon.radius / planet.radius, gm_rp3)


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


def moon_occultors(geometry):
    """(center, radius) of EVERY non-planet object in ``geometry.objects``
    at its observation-time phase — the spheres that occult lines of sight
    (the reference's inputfiles.rst says included objects contribute
    'collisions with their surfaces'; its engine never implements any).
    Returns an empty list for geometries without moons or phases."""
    planet = geometry.planet
    out = []
    for moon in geometry.objects:
        if moon.object == planet.object:
            continue
        center, _ = satellite_orbit(planet, moon,
                                    moon_phi(geometry, moon.object))
        out.append((center, moon.radius / planet.radius))
    return out


def moon_occultor_orbits(geometry):
    """Orbit parameters ``(a_rp, omega, phi_obs, radius_rp)`` of every
    non-planet object — for observables that place each occulting moon at
    a SNAPSHOT's own time (phi_obs - omega * t), e.g. the moon-centered
    image frame (quirk F26)."""
    planet = geometry.planet
    out = []
    for moon in geometry.objects:
        if moon.object == planet.object:
            continue
        a_rp, omega = orbit_params(planet, moon)
        out.append((a_rp, omega, moon_phi(geometry, moon.object),
                    moon.radius / planet.radius))
    return out


def satellite_initial_positions(inputs):
    """Back-compat shim for the reference's module name."""
    return satellite_start(inputs.geometry)
