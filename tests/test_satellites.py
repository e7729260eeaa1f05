"""Satellite (moon) start points — a working capability the reference
refuses ('Satellite start points not set up', Output.py:153-155; quirk F16).

Physics checks: orbital geometry of the launch sphere, orbital-velocity
inheritance, and a quarter-orbit integration of zero-relative-speed packets
that must stay on the moon's circular orbit (the vendored table's orbital
periods are Kepler-consistent with the planet masses)."""
import math
import os

import numpy as np
import pytest

from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.initial_state.sampling import build_initial_state
from nexoclom_tpu.initial_state.satellites import (moon_phi, satellite_orbit,
                                                   satellite_start)
from nexoclom_tpu.solarsystem import SSObject

pytestmark = pytest.mark.initial_state

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _io_inputs():
    return Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))


def test_satellite_orbit_geometry():
    jupiter, io = SSObject('Jupiter'), SSObject('Io')
    a_rp = io.a / jupiter.radius
    for phi in (0.0, 1.0, math.pi, 4.5):
        center, v_orb = satellite_orbit(jupiter, io, phi)
        assert np.linalg.norm(center) == pytest.approx(a_rp, rel=1e-12)
        # velocity tangential, prograde (same sense as increasing phi)
        assert abs(np.dot(center, v_orb)) < 1e-15
        omega = 2 * math.pi / (io.orbperiod * 86400)
        assert np.linalg.norm(v_orb) == pytest.approx(a_rp * omega)
    # phi=0 is sub-solar (model frame: sun along -y)
    center, _ = satellite_orbit(jupiter, io, 0.0)
    np.testing.assert_allclose(center, [0.0, -a_rp, 0.0], atol=1e-12)


def test_moon_phi_input_order():
    inp = _io_inputs()      # objects = Jupiter, Io, Europa; phi = 1, 2
    assert moon_phi(inp.geometry, 'Io') == 1.0
    assert moon_phi(inp.geometry, 'Europa') == 2.0
    center, v_orb, scale = satellite_start(inp.geometry)
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    assert scale == pytest.approx(io.radius / jupiter.radius)


def test_initial_state_on_moon_surface():
    """Packets start within one moon radius of the moon center, with the
    moon's orbital velocity added."""
    inp = _io_inputs()
    x0 = build_initial_state(inp, 2000, seed=5)
    center, v_orb, scale = satellite_start(inp.geometry)
    pos = np.stack([np.asarray(x0[c]) for c in 'xyz'], axis=1)
    r_moon = np.linalg.norm(pos - center, axis=1)
    np.testing.assert_allclose(r_moon, scale, rtol=1e-6)
    # mean velocity = orbital velocity (isotropic launch averages out)
    vel = np.stack([np.asarray(x0['v' + c]) for c in 'xyz'], axis=1)
    jupiter = SSObject('Jupiter')
    v_launch = 4.0 / jupiter.radius          # flat dist mean (vprob=4 km/s)
    assert np.linalg.norm(vel.mean(axis=0) - v_orb) < 0.3 * v_launch


def test_zero_speed_packets_ride_the_orbit():
    """v_rel = 0 launches stay on Io's circular orbit and advance by
    omega*t: the table's periods are Kepler-consistent with GM_Jupiter."""
    from nexoclom_tpu.initial_state.sections import AngularDist, SpeedDist
    from nexoclom_tpu.particle_tracking import Output
    inp = _io_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '0', 'sigma': '0'})
    inp.angulardist = AngularDist({'type': 'radial'})
    io = SSObject('Io')
    period = io.orbperiod * 86400.0
    inp.options.endtime = period / 4
    inp.options.step_size = 30.0
    inp.options.lifetime = 1e30         # no losses
    out = Output(inp, 16, seed=2)
    jupiter = SSObject('Jupiter')
    a_rp = io.a / jupiter.radius
    X = out.X
    r = np.sqrt(X.x ** 2 + X.y ** 2 + X.z ** 2).to_numpy()
    # launch points sit +/- 1 R_Io (0.0255 R_J) off the orbit radius, so
    # the osculating orbits oscillate a few moon radii around a
    np.testing.assert_allclose(r, a_rp, rtol=0.04)
    # phase advanced by ~pi/2 from phi=1 at the FINAL snapshot (X holds the
    # whole trajectory history); lon convention atan2(x, -y)
    last = X.groupby('Index').tail(1)
    lon = (np.arctan2(last.x, -last.y) + 2 * np.pi) % (2 * np.pi)
    expected = (1.0 + 2 * np.pi / 4) % (2 * np.pi)
    assert abs(np.median(lon) - expected) < 0.05


def test_satellite_run_end_to_end():
    inp = _io_inputs()
    inp.options.endtime = 3600.0
    inp.options.step_size = 30.0
    from nexoclom_tpu.particle_tracking import Output
    out = Output(inp, 100, seed=3)
    assert len(out.X) > 0
    frac = out.X.frac.to_numpy()
    assert np.all(np.isfinite(frac)) and np.all(frac >= 0)
