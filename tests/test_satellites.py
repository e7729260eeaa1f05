"""Satellite (moon) start points — a working capability the reference
refuses ('Satellite start points not set up', Output.py:153-155; quirk F16).

Physics checks: the documented phi convention (inputfiles.rst:72-77),
moving-moon launch phases, orbital-velocity inheritance, the moon's own
gravity (energy conservation against a static moon), re-impact removal of
sub-escape launches, and a quarter-orbit ride of zero-relative-speed
packets with moon physics disabled (validates the vendored periods are
Kepler-consistent with the planet masses)."""
import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.initial_state.sampling import build_initial_state
from nexoclom_tpu.initial_state.satellites import (moon_phi,
                                                   satellite_orbit,
                                                   satellite_params,
                                                   satellite_start)
from nexoclom_tpu.ops.integrator import constant_step_driver
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
    # documented convention (inputfiles.rst:72-77): phi=0 is superior
    # conjunction (anti-solar; sun at -y) and pi/2 is the dawn terminator
    # (x = dusk -> dawn at -x)
    center, _ = satellite_orbit(jupiter, io, 0.0)
    np.testing.assert_allclose(center, [0.0, a_rp, 0.0], atol=1e-12)
    center, _ = satellite_orbit(jupiter, io, math.pi / 2)
    np.testing.assert_allclose(center, [-a_rp, 0.0, 0.0], atol=1e-12)


def test_moon_phi_input_order():
    inp = _io_inputs()      # objects = Jupiter, Io, Europa; phi = 1, 2
    assert moon_phi(inp.geometry, 'Io') == 1.0
    assert moon_phi(inp.geometry, 'Europa') == 2.0
    center, v_orb, scale = satellite_start(inp.geometry)
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    assert scale == pytest.approx(io.radius / jupiter.radius)
    a_rp, omega, phi_obs, moon_radius, moon_gm = satellite_params(
        inp.geometry)
    assert phi_obs == 1.0
    assert moon_gm < 0          # negative-GM convention
    assert moon_gm == pytest.approx(
        io.GM / (jupiter.radius * 1000.0) ** 3)


def test_initial_state_on_moving_moon_surface():
    """Each packet starts one moon radius (times exobase) from the moon's
    center AT ITS OWN LAUNCH TIME: phi(t) = phi_obs - omega * t."""
    inp = _io_inputs()      # no step_size -> adaptive -> random ages
    x0 = build_initial_state(inp, 2000, seed=5)
    a_rp, omega, phi_obs, moon_radius, _ = satellite_params(inp.geometry)
    t = np.asarray(x0['time'])
    assert t.std() > 0      # random steady-state ages
    phi = phi_obs - omega * t
    cx, cy = -a_rp * np.sin(phi), a_rp * np.cos(phi)
    d = np.sqrt((np.asarray(x0['x']) - cx) ** 2 +
                (np.asarray(x0['y']) - cy) ** 2 +
                np.asarray(x0['z']) ** 2)
    np.testing.assert_allclose(d, moon_radius, rtol=1e-6)
    # launches spread along the orbital arc (ages span ~0.07 rad of phase)
    assert (phi.max() - phi.min()) > omega * t.max() * 0.5


def test_zero_speed_packets_ride_the_orbit_without_moon_physics():
    """With the moon's own gravity/impact off, v_rel = 0 launches stay on
    Io's circular orbit and advance by omega*t: the vendored periods are
    Kepler-consistent with GM_Jupiter."""
    from nexoclom_tpu.initial_state.sections import (AngularDist, Options,
                                                     SpeedDist)
    from nexoclom_tpu.particle_tracking.output import (
        build_force_table, build_surface_table, engine_spec_from_inputs)
    from nexoclom_tpu.initial_state.sections import effective_taa
    from nexoclom_tpu.ops.integrator import packet_state_from_dict
    from nexoclom_tpu.solarsystem import planet_dist

    inp = _io_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '0',
                               'sigma': '0'})
    inp.angulardist = AngularDist({'type': 'radial'})
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    period = io.orbperiod * 86400.0
    inp.options.endtime = period / 4
    inp.options.step_size = 30.0
    inp.options.lifetime = 1e30

    radius_km = jupiter.radius
    taa = effective_taa(inp.geometry)
    r, v_r = planet_dist(jupiter, taa)
    spec = engine_spec_from_inputs(inp)
    spec = dataclasses.replace(spec, moon_gravity=False, moon_impact=False)
    forces = build_force_table(inp, r, v_r / radius_km, radius_km,
                               jnp.float64)
    surface = build_surface_table(inp, spec, radius_km, jnp.float64)
    x0 = build_initial_state(inp, 16, seed=2, dtype=jnp.float64)
    nsteps = int(np.ceil(inp.options.endtime / 30.0) + 1)
    final, _ = constant_step_driver(
        packet_state_from_dict(x0), spec, forces, surface,
        jnp.asarray(30.0), jnp.asarray(1e30), jnp.asarray(radius_km),
        jax.random.PRNGKey(0), nsteps=nsteps, save_history=False)

    a_rp = io.a / jupiter.radius
    rr = np.sqrt(np.asarray(final.x) ** 2 + np.asarray(final.y) ** 2 +
                 np.asarray(final.z) ** 2)
    # launch points sit +/- 1 R_Io off the orbit radius, so the osculating
    # orbits oscillate a few moon radii around a
    np.testing.assert_allclose(rr, a_rp, rtol=0.04)
    # phase advanced by ~pi/2 from the LAUNCH phase phi_obs - omega*endtime
    a_, omega, phi_obs, _, _ = satellite_params(inp.geometry)
    phi_launch = phi_obs - omega * inp.options.endtime
    expected = phi_launch + 2 * np.pi / 4
    # model angle of the documented convention: phi = atan2(-x, y)
    got = np.arctan2(-np.asarray(final.x), np.asarray(final.y))
    err = (got - expected + np.pi) % (2 * np.pi) - np.pi
    assert abs(np.median(err)) < 0.05


def test_sub_escape_launches_fall_back_to_the_moon():
    """1 km/s radial launches (Io v_esc = 2.56 km/s) are bound to Io: with
    moon gravity + impact on (the default) they fall back and are removed;
    3.5 km/s launches escape the moon and survive."""
    from nexoclom_tpu.initial_state.sections import AngularDist, SpeedDist
    from nexoclom_tpu.particle_tracking import Output

    def run(vprob):
        inp = _io_inputs()
        inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': str(vprob),
                                   'sigma': '0'})
        inp.angulardist = AngularDist({'type': 'radial'})
        inp.options.endtime = 7200.0
        inp.options.step_size = 15.0
        inp.options.lifetime = 1e30
        out = Output(inp, 64, seed=7, compress=False)
        last = out.X.groupby('Index').tail(1)
        return last.frac.to_numpy()

    frac_slow = run(1.0)
    assert (frac_slow == 0).mean() > 0.9       # bound -> re-impact removed
    frac_fast = run(3.5)
    assert (frac_fast > 0).mean() > 0.9        # escapes the moon


def test_moon_gravity_conserves_energy_static_moon():
    """omega = 0 freezes the moon: total energy in the two-center field
    (planet + moon point mass, negative-GM convention) is conserved."""
    from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                             empty_force_table)
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    a_rp = io.a / jupiter.radius
    gm_p = jupiter.gm_rp3
    gm_m = io.GM / (jupiter.radius * 1000.0) ** 3
    n = 64
    rng = np.random.default_rng(3)
    # packets near (but not on) the moon at phi = 0 -> center (0, a)
    pos = np.array([0.0, a_rp, 0.0]) + rng.normal(0, 0.2, (n, 3))
    vel = rng.normal(0, 5e-5, (n, 3))
    state0 = PacketState(
        t=jnp.full(n, 1e8), x=jnp.asarray(pos[:, 0]),
        y=jnp.asarray(pos[:, 1]), z=jnp.asarray(pos[:, 2]),
        vx=jnp.asarray(vel[:, 0]), vy=jnp.asarray(vel[:, 1]),
        vz=jnp.asarray(vel[:, 2]),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    spec = EngineSpec(gravity=True, radpres=False, constant_rate=True,
                      surface_bounce=False, check_outer_edge=False,
                      moon_gravity=True, moon_impact=False)
    forces = empty_force_table(jnp.float64)._replace(
        gm=jnp.asarray(gm_p), ion_rate=jnp.asarray(0.0),
        moon_gm=jnp.asarray(gm_m), moon_a=jnp.asarray(a_rp),
        moon_omega=jnp.asarray(0.0), moon_phi=jnp.asarray(0.0),
        moon_radius=jnp.asarray(io.radius / jupiter.radius))

    def energy(s):
        r = np.sqrt(np.asarray(s.x) ** 2 + np.asarray(s.y) ** 2 +
                    np.asarray(s.z) ** 2)
        d = np.sqrt(np.asarray(s.x) ** 2 + (np.asarray(s.y) - a_rp) ** 2 +
                    np.asarray(s.z) ** 2)
        v2 = (np.asarray(s.vx) ** 2 + np.asarray(s.vy) ** 2 +
              np.asarray(s.vz) ** 2)
        # negative-GM convention: potential is +GM/r with GM < 0
        return 0.5 * v2 + gm_p / r + gm_m / d

    e0 = energy(state0)
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(20.0), jnp.asarray(1e30),
        jnp.asarray(jupiter.radius), jax.random.PRNGKey(0), nsteps=301,
        save_history=False)
    alive = np.asarray(final.frac) > 0
    assert alive.sum() > 40
    e1 = energy(final)
    assert np.max(np.abs((e1 - e0) / e0)[alive]) < 1e-6


def test_satellite_run_end_to_end():
    inp = _io_inputs()
    inp.options.endtime = 3600.0
    inp.options.step_size = 30.0
    from nexoclom_tpu.particle_tracking import Output
    out = Output(inp, 100, seed=3)
    assert len(out.X) > 0
    frac = out.X.frac.to_numpy()
    assert np.all(np.isfinite(frac)) and np.all(frac >= 0)


def test_moon_shadow_blocks_photo_loss():
    """Packets in the moving moon's shadow cylinder (anti-solar of the
    moon, within its radius) lose no frac to photoionization."""
    from nexoclom_tpu.ops.integrator import (EngineSpec, PacketState,
                                             empty_force_table)
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    a_rp = io.a / jupiter.radius
    r_m = io.radius / jupiter.radius
    # moon at phi=pi/2 (dawn, (-a, 0)): well clear of the PLANET's shadow
    # cylinder (at phi=0 the moon itself is eclipsed by the planet, so
    # nothing there is sunlit anyway — physically handled by the planet
    # shadow term)
    spec = EngineSpec(gravity=False, radpres=False, constant_rate=False,
                      surface_bounce=False, check_outer_edge=False,
                      moon_shadow=True, moon_impact=False)
    forces = empty_force_table(jnp.float64)._replace(
        ion_rate=jnp.asarray(1e-3),
        moon_gm=jnp.asarray(0.0),
        moon_a=jnp.asarray(a_rp), moon_omega=jnp.asarray(0.0),
        moon_phi=jnp.asarray(math.pi / 2), moon_radius=jnp.asarray(r_m))
    n = 3
    # packet 0: in the moon's shadow (anti-solar of the moon, inside the
    # cylinder); packet 1: sunward of the moon; packet 2: off-axis
    x = jnp.asarray([-a_rp, -a_rp, -a_rp + 5 * r_m])
    y = jnp.asarray([5 * r_m, -5 * r_m, 5 * r_m])
    state0 = PacketState(
        t=jnp.full(n, 1e9), x=x, y=y, z=jnp.zeros(n),
        vx=jnp.zeros(n), vy=jnp.zeros(n), vz=jnp.zeros(n),
        frac=jnp.ones(n), lossfrac=jnp.zeros(n))
    final, _ = constant_step_driver(
        state0, spec, forces, None, jnp.asarray(100.0), jnp.asarray(1e30),
        jnp.asarray(jupiter.radius), jax.random.PRNGKey(0), nsteps=11,
        save_history=False)
    frac = np.asarray(final.frac)
    assert frac[0] == pytest.approx(1.0)                 # shadowed: no loss
    expected = math.exp(-1e-3 * 100.0 * 10)
    assert frac[1] == pytest.approx(expected, rel=1e-6)  # sunlit: decays
    assert frac[2] == pytest.approx(expected, rel=1e-6)


def test_europa_and_moon_startpoints_run():
    """Any tabulated moon works as a startpoint (Europa here), not just
    the fixture's Io."""
    from nexoclom_tpu.initial_state.sections import Geometry
    from nexoclom_tpu.particle_tracking import Output
    inp = _io_inputs()
    inp.geometry = Geometry({'planet': 'Jupiter', 'startpoint': 'Europa',
                             'objects': 'Jupiter, Europa', 'phi': '2.0',
                             'taa': '1.57'})
    inp.options.endtime = 1800.0
    inp.options.step_size = 30.0
    out = Output(inp, 64, seed=9)
    assert len(out.X) > 0
    europa, jupiter = SSObject('Europa'), SSObject('Jupiter')
    a_rp = europa.a / jupiter.radius
    first = out.X.groupby('Index').head(1)
    r = np.sqrt(first.x ** 2 + first.y ** 2 + first.z ** 2).to_numpy()
    np.testing.assert_allclose(r, a_rp, rtol=2 * europa.radius /
                               europa.a + 1e-3)


def test_moon_bounce_kernel_exactness_static_moon():
    """bounce_moon_packets with a static moon: the impactor lands ON the
    moon sphere, the elastic relative rebound speed satisfies energy
    conservation in the moon's field, and the re-emitted velocity includes
    the moon's orbital velocity (zero here); non-hit lanes are untouched."""
    from nexoclom_tpu.ops.integrator import EngineSpec, PacketState, \
        empty_force_table
    from nexoclom_tpu.ops.surface import bounce_moon_packets
    io, jupiter = SSObject('Io'), SSObject('Jupiter')
    a_rp = io.a / jupiter.radius
    r_m = io.radius / jupiter.radius
    gm_m = io.GM / (jupiter.radius * 1000.0) ** 3
    forces = empty_force_table(jnp.float64)._replace(
        moon_gm=jnp.asarray(gm_m), moon_a=jnp.asarray(a_rp),
        moon_omega=jnp.asarray(0.0), moon_phi=jnp.asarray(0.0),
        moon_radius=jnp.asarray(r_m))
    # moon center at (0, a); packet 0 has sunk below the surface moving
    # radially inward (relative radius 0.9 R_m), packet 1 is far away
    v_in = 1.0 / jupiter.radius      # 1 km/s inward, model units
    state = PacketState(
        t=jnp.asarray([100.0, 100.0]),
        x=jnp.asarray([0.0, 3.0]), y=jnp.asarray([a_rp + 0.9 * r_m, 0.0]),
        z=jnp.zeros(2),
        vx=jnp.zeros(2), vy=jnp.asarray([-v_in, 0.0]), vz=jnp.zeros(2),
        frac=jnp.ones(2), lossfrac=jnp.zeros(2))
    hit = jnp.asarray([True, False])
    spec = EngineSpec(surface_bounce=True, moon_bounce=True, accom=False,
                      sticktype='constant')
    import types
    # the elastic constant-stick path touches only stickcoef (+ the moon
    # temperature fields, None when thermal terms are off)
    surface = types.SimpleNamespace(stickcoef=jnp.asarray(0.25),
                                    taa=jnp.asarray(0.0),
                                    moon_t0=None, moon_t1=None)
    out = bounce_moon_packets(jax.random.PRNGKey(1), state, hit, spec,
                              surface, forces)
    # on the sphere
    d = np.sqrt(float(out.x[0]) ** 2 + (float(out.y[0]) - a_rp) ** 2 +
                float(out.z[0]) ** 2)
    assert d == pytest.approx(r_m, rel=1e-12)
    # elastic speed: v^2 = v_in^2 + 2 gm (1/r - 1/R), gm negative, r < R
    # -> slower at the surface than at the (interior) sample point is
    # impossible; here r_now < R so the packet LOSES speed climbing out
    expected = math.sqrt(v_in ** 2 +
                         2 * gm_m * (1 / (0.9 * r_m) - 1 / r_m))
    got = math.sqrt(float(out.vx[0]) ** 2 + float(out.vy[0]) ** 2 +
                    float(out.vz[0]) ** 2)
    assert got == pytest.approx(expected, rel=1e-10)
    # sticking applied
    assert float(out.frac[0]) == pytest.approx(0.75)
    # outward in the moon frame
    rel = np.array([float(out.x[0]), float(out.y[0]) - a_rp,
                    float(out.z[0])])
    vel = np.array([float(out.vx[0]), float(out.vy[0]), float(out.vz[0])])
    assert np.dot(rel, vel) > 0
    # non-hit lane untouched
    assert float(out.x[1]) == 3.0 and float(out.frac[1]) == 1.0


def test_moon_bounce_elastic_retains_bound_packets():
    """Sub-escape Io launches with an elastic, non-sticking surface hop
    instead of dying: compare with the full-stick case of
    test_sub_escape_launches_fall_back_to_the_moon."""
    from nexoclom_tpu.initial_state.sections import (AngularDist, SpeedDist,
                                                     SurfaceInteraction)
    from nexoclom_tpu.particle_tracking import Output

    def run(stickcoef):
        inp = _io_inputs()
        inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '1.0',
                                   'sigma': '0'})
        inp.angulardist = AngularDist({'type': 'radial'})
        inp.surfaceinteraction = SurfaceInteraction(
            {'stickcoef': str(stickcoef), 'accomfactor': '0'})
        inp.options.endtime = 7200.0
        inp.options.step_size = 15.0
        inp.options.lifetime = 1e30
        out = Output(inp, 64, seed=7, compress=False)
        return out.X.groupby('Index').tail(1).frac.to_numpy()

    frac_elastic = run(0.0)
    assert (frac_elastic > 0.99).mean() > 0.95   # bound but bouncing: alive
    frac_half = run(0.5)
    # every fallen packet bounced at least once -> frac in (0, 1);
    # most launches are sub-escape so most packets lose frac
    assert ((frac_half > 0) & (frac_half < 0.51)).mean() > 0.5
    assert frac_half.mean() < frac_elastic.mean()


def test_moon_bounce_thermal_accommodation_runs():
    """Temperature-dependent sticking + accommodation on the moon: the full
    thermal path (moon-local surface temperature, emission-speed table)
    produces finite, bounded fracs and packets stay outside the moon."""
    from nexoclom_tpu.initial_state.sections import (AngularDist, SpeedDist,
                                                     SurfaceInteraction)
    from nexoclom_tpu.initial_state.satellites import satellite_params
    from nexoclom_tpu.particle_tracking import Output

    inp = _io_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '1.0',
                               'sigma': '0.2'})
    inp.angulardist = AngularDist({'type': 'radial'})
    inp.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'temperature dependent', 'accomfactor': '0.8'})
    inp.options.endtime = 3600.0
    inp.options.step_size = 15.0
    inp.options.lifetime = 1e30
    out = Output(inp, 64, seed=11, compress=False)
    frac = out.X.frac.to_numpy()
    assert np.all(np.isfinite(frac)) and np.all(frac >= 0)
    assert np.all(frac <= 1.0 + 1e-12)
    a_rp, omega, phi_obs, r_m, _ = satellite_params(inp.geometry)
    last = out.X.groupby('Index').tail(1)
    alive = last.frac.to_numpy() > 0
    t = last.time.to_numpy()
    phi = phi_obs - omega * t
    d = np.sqrt((last.x.to_numpy() + a_rp * np.sin(phi)) ** 2 +
                (last.y.to_numpy() - a_rp * np.cos(phi)) ** 2 +
                last.z.to_numpy() ** 2)
    assert np.all(d[alive] > 0.99 * r_m)
    # the thermal surface sticks some packets at least partially
    assert (last.frac.to_numpy()[alive] < 1.0).any()


def test_moon_bounce_adaptive_driver():
    """The moon bounce runs in the ADAPTIVE driver too (both drivers share
    _apply_kills): sub-escape elastic launches survive a steady-state run."""
    from nexoclom_tpu.initial_state.sections import (AngularDist, SpeedDist,
                                                     SurfaceInteraction)
    from nexoclom_tpu.particle_tracking import Output
    inp = _io_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '1.0',
                               'sigma': '0'})
    inp.angulardist = AngularDist({'type': 'radial'})
    inp.surfaceinteraction = SurfaceInteraction(
        {'stickcoef': '0', 'accomfactor': '0'})
    inp.options.endtime = 3600.0
    inp.options.step_size = 0.0      # adaptive
    inp.options.lifetime = 1e30
    out = Output(inp, 64, seed=13, compress=False)
    frac = out.X.frac.to_numpy()
    assert (frac > 0.99).mean() > 0.9    # bouncing, not removed
    # finished: remaining time integrated down to ~0
    assert (out.X.time.to_numpy() < inp.options.resolution * 10).all()


def test_moon_bounce_sharded_matches_unsharded():
    """Satellite physics (moving moon + bounce) under a packet-sharded mesh
    is bit-compatible with the single-device run."""
    from nexoclom_tpu.initial_state.sections import (AngularDist, SpeedDist,
                                                     SurfaceInteraction)
    from nexoclom_tpu.parallel import make_mesh
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    inp = _io_inputs()
    inp.speeddist = SpeedDist({'type': 'gaussian', 'vprob': '1.5',
                               'sigma': '0.2'})
    inp.angulardist = AngularDist({'type': 'radial'})
    inp.surfaceinteraction = SurfaceInteraction(
        {'stickcoef': '0.3', 'accomfactor': '0.5'})
    inp.options.endtime = 1800.0
    inp.options.step_size = 30.0
    inp.options.lifetime = 1e30
    params = {'quantity': 'column', 'dims': '24,24', 'width': '16,16'}
    plain = fused_image_run(inp, 256, dict(params), seed=21)
    mesh = make_mesh(n_ensemble=1, n_packet_shards=8)
    sharded = fused_image_run(inp, 256, dict(params), seed=21, mesh=mesh)
    assert np.allclose(sharded.image, plain.image, rtol=1e-10,
                       atol=plain.image.max() * 1e-12)


def test_moon_surface_map_sticking_falls_back_to_removal():
    """Surface-map sticking on a satellite run keeps the map-driven bounce
    on the PLANET but uses removal semantics on the moon: the map is
    planet-fixed, so there is nothing to bounce against on the moon
    (advisor round 2 — this configuration used to be rejected outright).
    The catalog marker follows the same gate: no moon_bounce marker."""
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    from nexoclom_tpu.particle_tracking.output import engine_spec_from_inputs
    mapfile = os.path.join(os.path.dirname(__file__), 'data',
                           'sticking_maps', 'orbit_ca_sticking.pkl')
    assert os.path.exists(mapfile)
    inp = _io_inputs()
    inp.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'surface map', 'accomfactor': '0.5',
         'stick_mapfile': mapfile})
    spec = engine_spec_from_inputs(inp)
    assert spec.surface_bounce            # the planet map still bounces
    assert spec.sticktype == 'surface map'
    assert spec.moon_impact               # re-impacts still detected...
    assert not spec.moon_bounce           # ...but remove, not re-emit
    assert 'engine' not in inp.to_dict()  # removal semantics: unmarked


def test_moon_bounce_catalog_semantics_marker():
    """Bouncing satellite inputs carry an engine-semantics marker in the
    canonical dict (quirk F21), so pre-bounce catalog records (re-impact =
    removal) are never mixed into bounce-semantics runs; full-stick
    satellite and planet inputs are unmarked (matching unchanged)."""
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    from nexoclom_tpu.utilities.catalog import _match_inputs
    inp = _io_inputs()                      # fixture: stickcoef = 1
    assert 'engine' not in inp.to_dict()
    inp.surfaceinteraction = SurfaceInteraction(
        {'stickcoef': '0.5', 'accomfactor': '0'})
    marked = inp.to_dict()
    assert marked['engine'] == {'moon_bounce': True}
    # a pre-marker record of the same sections does NOT match
    legacy = {k: v for k, v in marked.items() if k != 'engine'}
    assert _match_inputs(legacy, marked) is None
    assert _match_inputs(marked, marked) is not None
    # round-trips through restore
    from nexoclom_tpu.initial_state import Input
    assert Input.from_dict(marked).to_dict() == marked


def test_moon_surface_temperature_scaling():
    """The moon bounce uses the heliocentric-distance-rescaled dayside
    amplitude (the raw Mercury calibration would run Io ~2.5x too hot);
    the emission-speed table's range covers the moon model."""
    from nexoclom_tpu.initial_state.sections import SurfaceInteraction
    from nexoclom_tpu.initial_state.surface_temperature import (
        moon_dayside_amplitude)
    from nexoclom_tpu.particle_tracking.output import (
        build_surface_table, engine_spec_from_inputs)
    # the calibration anchor reproduces Mercury's own amplitude
    assert moon_dayside_amplitude(0.3075) == pytest.approx(600.0)
    # equilibrium scaling at Jupiter
    assert moon_dayside_amplitude(5.2) == pytest.approx(
        600.0 * (0.3075 / 5.2) ** 0.5, rel=1e-12)
    inp = _io_inputs()
    inp.surfaceinteraction = SurfaceInteraction(
        {'sticktype': 'temperature dependent', 'accomfactor': '0.8'})
    spec = engine_spec_from_inputs(inp)
    assert spec.moon_bounce
    surface = build_surface_table(inp, spec, 71492.0, jnp.float64)
    t1 = float(surface.moon_t1)
    assert 100.0 < t1 < 200.0        # ~146 K at Jupiter's distance
    # temperature grid covers the moon's range [t0, t0 + t1]
    assert float(surface.temp0) <= float(surface.moon_t0)
    nt = surface.v_table.shape[0]
    assert (float(surface.temp0) + float(surface.dtemp) * (nt - 1)
            >= float(surface.moon_t0) + t1)


def test_satellite_image_paths_agree():
    """Fused and stored-history images apply the same moon occultation and
    shadow masks: same seed -> same image (f32-storage tolerance)."""
    from nexoclom_tpu.data_simulation import ModelImage
    from nexoclom_tpu.particle_tracking import Output
    from nexoclom_tpu.particle_tracking.fused import fused_image_run
    inp = _io_inputs()
    inp.options.endtime = 1800.0
    inp.options.step_size = 30.0
    params = {'quantity': 'radiance', 'dims': '48,48', 'width': '16,16'}
    Output(inp, 300, seed=44, compress=False)
    stored = ModelImage(inp, dict(params))
    fused = fused_image_run(inp, 300, dict(params), seed=44)
    assert fused.totalsource == stored.totalsource
    assert np.allclose(fused.image, stored.image, rtol=5e-3,
                       atol=stored.image.max() * 1e-6)
