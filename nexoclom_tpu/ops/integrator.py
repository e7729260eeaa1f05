"""The particle-tracking engine: Dormand-Prince RK5(4) over packet batches.

TPU-native re-design of ``nexoclom/particle_tracking/{rk5,state,Output}.py``:

* State is a structure-of-arrays pytree over the packet axis; every operation
  is elementwise, so XLA fuses an entire 6-stage RK step (gravity + radiation
  pressure table lookup + shadow masks + photoionization) into a handful of
  vector kernels, and the packet axis shards transparently over a device mesh.
* The constant-step driver is one ``lax.scan`` over time steps; the adaptive
  driver is one ``lax.while_loop`` with per-packet step sizes and lockstep
  predication — dead packets are masked, never compacted (fixed shapes).
* The survival fraction integrates in log space inside the step
  (``rk5.py:25,49-50``), with the photoionization rate as d(log f)/dt.

Physics parity (``state.py:17-74``):
  - gravity: a = GM r / |r|^3 with GM negative;
  - radiation pressure: tabulated accel vs. heliocentric radial velocity
    (vy + vrplanet), applied along +y, zeroed in the planet's shadow
    (sqrt(x^2 + z^2) < 1 and y > 0);
  - ionization: 1/lifetime everywhere when an explicit lifetime is given,
    else the photo rate zeroed in shadow.

Step-control parity (``Output.py:221-366``): identical error scaling
(resolution on position, resolution/10 on velocity, log-frac error scaled
against the fractional tolerance), accept when errmax < 1, grow
0.95 h errmax^-0.2, shrink 0.95 h errmax^-0.25 floored at 0.1 h, reject-and-
retry with 10x step when errmax < 1e-7, kill on surface impact (full
sticking), escape, or frac < 1e-10.

Documented deviations (docs/QUIRKS.md): the adaptive driver compares the
*radius* (not radius squared) against ``outeredge``, and supports surface
bounce (the reference's adaptive path asserts it unsupported).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.ops.pltable import (PLTable, empty_pltable, pl_lookup,
                                      pl_lookup_with_slope)

# Dormand-Prince RK5(4) tableau (identical coefficients to rk5.py:5-18)
_DP_C = np.array([0.0, 0.2, 0.3, 0.8, 8.0 / 9.0, 1.0, 1.0])
_DP_B = np.array([35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0,
                  -2187.0 / 6784.0, 11.0 / 84.0, 0.0])
_DP_BS = np.array([5179.0 / 57600.0, 0.0, 7571.0 / 16695.0, 393.0 / 640.0,
                   -92097.0 / 339200.0, 187.0 / 2100.0, 1.0 / 40.0])
_DP_BD = _DP_B - _DP_BS
_DP_A = np.zeros((7, 7))
_DP_A[1, 0] = 0.2
_DP_A[2, :2] = [3.0 / 40.0, 9.0 / 40.0]
_DP_A[3, :3] = [44.0 / 45.0, -56.0 / 15.0, 32.0 / 9.0]
_DP_A[4, :4] = [19372.0 / 6561.0, -25360.0 / 2187.0, 64448.0 / 6561.0,
                -212.0 / 729.0]
_DP_A[5, :5] = [9017.0 / 3168.0, -355.0 / 33.0, 46732.0 / 5247.0,
                49.0 / 176.0, -5103.0 / 18656.0]
_DP_A[6, :] = _DP_B

FRAC_FLOOR = 1e-10      # packet kill threshold (Output.py:321,413)


def default_lookup_impl() -> str:
    """'gather' on CPU, 'relu' on accelerators (see uniform_lookup and
    ops/pltable.py: the compressed relu expansion measured ~4x faster than
    the dense hat contraction on v5e, 0.35 ms vs 1.3 ms per 1M lookups)."""
    return 'gather' if jax.default_backend() == 'cpu' else 'relu'
_TINY = 1e-300   # note: flushes to 0 in f32 — dead lanes (frac == 0) run
                 # log(0) = -inf through the log-frac chain; exp(-inf) = 0
                 # keeps them exactly dead, and the adaptive error
                 # estimate's inf - inf = NaN is discarded by the
                 # active-lane predicate.  Measured cost on v5e: none
                 # (flat 2.1 ms/iter across a full adaptive run).


@dataclass(frozen=True)
class EngineSpec:
    """Static (compile-time) engine configuration."""
    gravity: bool = True
    radpres: bool = True
    constant_rate: bool = False   # True: ionization everywhere (lifetime > 0)
    surface_bounce: bool = False  # False: full sticking kills on impact
    # 'constant' | 'temperature dependent' | 'surface map'
    sticktype: str = 'constant'
    accom: bool = False           # thermal accommodation at the surface
    # surface-map sticking: map longitudes are planet-fixed and must rotate
    # by the subsolar longitude at lookup (source_distribution.py:85-91)
    stick_map_planet_fixed: bool = False
    # satellite (moon) source physics: the startpoint moon's time-dependent
    # point-mass gravity, shadow cylinder, and re-impact removal
    # (capabilities the reference lacks entirely — its engine refuses
    # satellite runs, quirk F16).  moon_shadow is an ILLUMINATION effect
    # and is gated separately from the force term, so gravity-off runs
    # keep their eclipse physics.
    moon_gravity: bool = False
    moon_shadow: bool = False
    moon_impact: bool = False
    # re-emit from the moon instead of removing on re-impact: the same
    # bounce physics as the planet surface, evaluated in the moon's
    # co-moving frame (ops/surface.bounce_moon_packets); requires
    # moon_impact for the hit detection
    moon_bounce: bool = False
    # extra loss channels (quirk F22): constant electron-impact rate
    # (applied everywhere — electrons are not blocked by the planet's
    # shadow) and charge-exchange rate (shadow-masked like the photo
    # rate).  The reference stubs both at 0 (LossInfo.py:9-10,
    # state.py:56-70 commented out).  Only valid with lifetime <= 0
    # (constant_rate=False), enforced by the Options section.
    eimp: bool = False
    chx: bool = False
    # spatially varying electron impact (quirk F23): separable
    # rate(rho, z) = f(rho) g(z) from ForceTable.eimp_rho_pl/eimp_z_pl,
    # applied everywhere; exclusive with the constant eimp channel
    eimp_profile: bool = False
    # quirk F28: multiply the profile by a longitude-structured factor
    # h(phi_sys) co-rotating with the planet (System III modulation),
    # from ForceTable.eimp_phi_pl
    eimp_phi: bool = False
    # quirk F25: evaluate the profile about a TILTED, co-rotating axis
    # (centrifugal-equator geometry): rho/z taken relative to the plane
    # whose normal leans eimp_tilt from the spin axis toward the azimuth
    # eimp_tilt_phase - eimp_tilt_omega * t (t counts down to the
    # observation, same convention as the moving moon)
    eimp_tilt: bool = False
    check_outer_edge: bool = True
    # radiation-pressure table lookup strategy: 'gather' (XLA gather; fast on
    # CPU, pathologically slow on TPU where it lowers to a scalar loop),
    # 'dense' (blocked hat-matrix contraction; ~12x faster on TPU v5e,
    # bit-identical linear interpolation), or 'relu' (knot-compressed
    # piecewise-linear expansion from ops/pltable.py; another ~4x over
    # 'dense' on v5e, max deviation from np.interp bounded by the
    # compression tolerance — default 0.1% of the table maximum)
    lookup_impl: str = 'gather'
    # True (parity): a(v) looked up at every RK stage (state.py evaluates
    # per stage).  False: one lookup per step at the pre-step velocity,
    # reused across stages (shadow masking stays per-stage).  The error is
    # O(a'(v) dv_step) with dv_step ~ 0.01 km/s vs table features >=0.25
    # km/s -- negligible; cuts the dominant TPU cost ~6x.
    # 'tangent': per-stage values via ONE shared knot walk — f and f' at
    # the pre-step velocity (pl_lookup_with_slope), each stage
    # reconstructed as f(v1) + f'(v1) (clip(v_i) - clip(v1)).  EXACT
    # per-stage interpolation whenever the stage velocities stay inside
    # v1's knot segment (spreads are O(h a) ~ 1e-3 km/s vs compressed
    # knot spacing >~ 0.25 km/s); error at a knot crossing is bounded by
    # max|dslope| * |v_i - v1| — measured ~1e-7 of table max on the Ca/Na
    # tables, 1000x below the 1e-3 compression envelope.  Needs a
    # compressed rp_pl (falls back to exact per-stage without one).
    radpres_per_stage: object = True


class ForceTable(NamedTuple):
    """Traced physics parameters (model units: R_planet, s)."""
    gm: jnp.ndarray              # scalar, negative
    vrplanet: jnp.ndarray        # scalar
    rp_v0: jnp.ndarray           # radpres table origin
    rp_dv: jnp.ndarray           # radpres table spacing
    rp_accel: jnp.ndarray        # (K,) radpres accel vs radial velocity
    ion_rate: jnp.ndarray        # scalar ionization rate (1/s)
    rp_pl: PLTable               # compressed a(v) for lookup_impl='relu'
    # startpoint-moon orbit (satellite runs): circular orbit in the
    # equatorial plane; phase at model time t is moon_phi - moon_omega * t
    # (t counts DOWN to the observation, see initial_state/satellites.py)
    moon_gm: jnp.ndarray = None      # scalar, R_planet^3/s^2, negative
    moon_a: jnp.ndarray = None       # scalar, R_planet
    moon_omega: jnp.ndarray = None   # scalar, rad/s
    moon_phi: jnp.ndarray = None     # scalar, phase at t=0 (observation)
    moon_radius: jnp.ndarray = None  # scalar, R_planet
    # optional extra loss channels (quirk F22; the reference stubs these):
    # electron impact applies everywhere, charge exchange is shadow-masked
    eimp_rate: jnp.ndarray = None    # scalar, 1/s
    chx_rate: jnp.ndarray = None     # scalar, 1/s
    # spatially varying electron impact (quirk F23): separable torus
    # profile rate(rho, z) = f(rho) g(z), each a compressed relu table
    eimp_rho_pl: PLTable = None      # f(rho), 1/s vs cylindrical radius
    eimp_z_pl: PLTable = None        # g(z), dimensionless vs height
    # non-separable field (quirk F27): truncated-SVD decomposition
    # rate = max(0, sum_k f_k(rho) g_k(z)) as (f_pl, g_pl) pairs; takes
    # precedence over the single separable pair when non-empty
    eimp_pl_terms: tuple = ()
    # fully coupled co-rotating field (quirk F29): CP decomposition
    # rate = max(0, sum_k f_k(rho) h_k(phi_sys) g_k(z)) as
    # (f_pl, h_pl, g_pl) triples; takes precedence over both 2-D forms
    eimp_cp_terms: tuple = ()
    # tilted co-rotating torus axis (quirk F25): the profile's symmetry
    # axis leans eimp_tilt from +z toward the azimuth (orbit_state
    # convention) eimp_tilt_phase - eimp_tilt_omega * t
    eimp_tilt_sin: jnp.ndarray = None    # scalar, sin(tilt)
    eimp_tilt_cos: jnp.ndarray = None    # scalar, cos(tilt)
    eimp_tilt_phase: jnp.ndarray = None  # scalar, azimuth at t=0 (rad)
    eimp_tilt_omega: jnp.ndarray = None  # scalar, rad/s (co-rotation)
    # longitude-structured co-rotating factor h(phi_sys) (quirk F28):
    # periodic relu table over [0, 2 pi] about the SPIN axis
    eimp_phi_pl: PLTable = None          # h(phi), dimensionless
    eimp_phi_phase: jnp.ndarray = None   # scalar, azimuth of the phi=0
                                         # longitude at t=0 (rad)
    eimp_rot_omega: jnp.ndarray = None   # scalar, rad/s


class SurfaceTable(NamedTuple):
    """Traced surface-interaction parameters (see ops/surface.py)."""
    stickcoef: jnp.ndarray       # scalar
    accomfactor: jnp.ndarray     # scalar
    stick_A: jnp.ndarray         # (3,) temperature-dependent sticking coefs
    taa: jnp.ndarray             # scalar, for the surface-temperature model
    v_table: jnp.ndarray         # (nt, nprob) emission speed (model units)
    temp0: jnp.ndarray           # temperature grid origin (K)
    dtemp: jnp.ndarray           # temperature grid spacing (K)
    stick_map: jnp.ndarray = None        # (nlon, nlat) sticking coefficient
    map_lon0: jnp.ndarray = None         # map grid origin (rad)
    map_dlon: jnp.ndarray = None         # map grid spacing (rad)
    map_lat0: jnp.ndarray = None
    map_dlat: jnp.ndarray = None
    map_subsolarlon: jnp.ndarray = None  # rotation for planet-fixed maps
    # moon surface-temperature model (satellite bounce, quirk F21): the
    # Mercury-calibrated dayside amplitude rescaled to the system's
    # heliocentric distance (see surface_temperature.moon_dayside_amplitude)
    moon_t0: jnp.ndarray = None          # nightside floor (K)
    moon_t1: jnp.ndarray = None          # dayside amplitude (K)


class PacketState(NamedTuple):
    """Structure-of-arrays packet batch; every leaf has shape (N,)."""
    t: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    frac: jnp.ndarray
    lossfrac: jnp.ndarray


def empty_force_table(dtype=jnp.float64) -> ForceTable:
    zero = jnp.zeros((), dtype)
    return ForceTable(gm=zero, vrplanet=zero, rp_v0=zero,
                      rp_dv=jnp.ones((), dtype),
                      rp_accel=jnp.zeros((2,), dtype), ion_rate=zero,
                      rp_pl=empty_pltable(dtype))


def uniform_lookup(table, v0, dv, value, impl: str = 'gather'):
    """O(1) linear interpolation on a uniform grid, clamping at the ends
    (np.interp edge semantics, as used by state.py:35-36).

    ``impl='gather'`` indexes the table directly (fast on CPU).
    ``impl='dense'`` evaluates the same interpolation as a blocked
    "hat-function" contraction sum_k max(0, 1-|pos-k|) table[k]: XLA's
    general gather lowers to a scalar loop on TPU (measured 19.6 ms per 1M
    lookups on v5e vs 1.7 ms for the dense form); the hat matrix lives only
    in VMEM-sized blocks.
    """
    nk = table.shape[0]
    pos = (value - v0) / dv
    pos = jnp.clip(pos, 0.0, nk - 1.0)
    if impl == 'gather':
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nk - 2)
        w = pos - lo
        return table[lo] * (1.0 - w) + table[lo + 1] * w
    if impl != 'dense':
        raise ValueError(f"uniform_lookup impl must be 'gather' or 'dense', "
                         f"got {impl!r} (the 'relu' strategy needs a "
                         f"compressed PLTable — see radpres_lookup)")

    block = 8192
    n = pos.shape[0]
    pad = (-n) % block
    padded = jnp.concatenate([pos, jnp.zeros(pad, pos.dtype)]) if pad else pos
    ks = jnp.arange(nk, dtype=pos.dtype)

    def one_block(p):
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(p[:, None] - ks[None, :]))
        return hat @ table

    out = jax.lax.map(one_block, padded.reshape(-1, block)).reshape(-1)
    return out[:n] if pad else out


def radpres_lookup(spec: EngineSpec, forces: ForceTable, vv):
    """a(v) table lookup via the spec's strategy (np.interp semantics;
    'relu' deviates by at most the pltable compression tolerance).

    'relu' requires a compressed table in ``forces.rp_pl``; a ForceTable
    built without one (``empty_force_table()._replace(rp_accel=...)``, the
    pre-compression construction pattern) falls back to 'dense' — the
    placeholder PLTable would otherwise evaluate to a silent a(v) = 0."""
    if spec.lookup_impl == 'relu' and forces.rp_pl.knots.shape[0] > 1:
        return pl_lookup(forces.rp_pl, vv)
    impl = 'dense' if spec.lookup_impl == 'relu' else spec.lookup_impl
    return uniform_lookup(forces.rp_accel, forces.rp_v0, forces.rp_dv, vv,
                          impl=impl)


def orbit_state(a, omega, phi, xp=jnp):
    """Circular-orbit position and velocity at phase ``phi`` under the
    reference's documented convention (inputfiles.rst:72-77: 0 = superior
    conjunction/anti-solar, pi/2 = dawn terminator; sun at -y, x = dusk;
    increasing phi = prograde).  Returns ``(x, y, vx, vy)`` (z = 0).
    THE single source of the convention — the sampler, the engine, and
    the host-side satellite helpers all call it."""
    return (-a * xp.sin(phi), a * xp.cos(phi),
            -a * omega * xp.cos(phi), -a * omega * xp.sin(phi))


def moon_state(forces: ForceTable, t):
    """Moon center (R_planet) and orbital velocity (R_planet/s) at model
    time ``t`` (counts down to the observation at t=0): phase
    phi(t) = moon_phi - omega*t.  THE single source of the moving-moon
    phase — hit detection, shadow, gravity, and the co-moving bounce frame
    all go through here (or :func:`moon_position` for position-only)."""
    phi = forces.moon_phi - forces.moon_omega * t
    return orbit_state(forces.moon_a, forces.moon_omega, phi)


def moon_position(forces: ForceTable, t):
    """Moon center (R_planet) at model time ``t``; see :func:`moon_state`."""
    mx, my, _, _ = moon_state(forces, t)
    return mx, my


def state_eval(x, y, z, vy, spec: EngineSpec, forces: ForceTable,
               arad_frozen=None, t=None):
    """Acceleration components and ionization rate for one RK stage.

    ``arad_frozen``: optional precomputed radiation acceleration (per-step
    evaluation mode, ``spec.radpres_per_stage=False``); the shadow mask is
    still applied per stage.  ``t`` (per-packet stage time) is required
    when ``spec.moon_gravity`` — the moon's position is time-dependent."""
    zero = jnp.zeros_like(x)
    if spec.gravity:
        r2 = x * x + y * y + z * z
        inv_r3 = jax.lax.rsqrt(r2) / r2
        gm_r3 = forces.gm * inv_r3
        ax, ay, az = gm_r3 * x, gm_r3 * y, gm_r3 * z
    else:
        ax, ay, az = zero, zero, zero

    mx = my = None
    if spec.moon_gravity or spec.moon_shadow:
        mx, my = moon_position(forces, t)
    if spec.moon_gravity:
        dx, dy = x - mx, y - my
        d2 = dx * dx + dy * dy + z * z
        mgm_d3 = forces.moon_gm * jax.lax.rsqrt(d2) / d2
        ax = ax + mgm_d3 * dx
        ay = ay + mgm_d3 * dy
        az = az + mgm_d3 * z

    out_of_shadow = None
    if spec.radpres or not spec.constant_rate or spec.chx:
        rho2 = x * x + z * z
        out_of_shadow = (rho2 > 1.0) | (y < 0.0)
        if spec.moon_shadow:
            # the startpoint moon's shadow cylinder (sun at -y): packets
            # behind the moving moon lose radiation pressure and photo loss
            in_moon_shadow = (((x - mx) ** 2 + z * z
                               < forces.moon_radius ** 2) & (y > my))
            out_of_shadow = out_of_shadow & ~in_moon_shadow

    if spec.radpres:
        if arad_frozen is None:
            arad = radpres_lookup(spec, forces, vy + forces.vrplanet)
        elif type(arad_frozen) is tuple:
            # tangent mode: (f(v1), f'(v1), clip(v1)) from one shared knot
            # walk in rk5_step; reconstruct this stage's value
            a1, s1, v1c = arad_frozen
            vc = jnp.clip(vy + forces.vrplanet, forces.rp_pl.knots[0],
                          forces.rp_pl.base[1])
            arad = a1 + s1 * (vc - v1c)
        else:
            arad = arad_frozen
        ay = ay + arad * out_of_shadow

    if spec.constant_rate:
        ion = jnp.full_like(x, forces.ion_rate)
    else:
        ion = forces.ion_rate * out_of_shadow
    # quirk F22: the "ionizerate = photorate + eimprate + chxrate" sum the
    # reference comments out (state.py:56-72)
    if spec.chx:
        ion = ion + forces.chx_rate * out_of_shadow
    if spec.eimp:
        ion = ion + forces.eimp_rate
    if spec.eimp_profile:
        # quirk F23: separable plasma-torus electron impact,
        # rate(rho, z) = f(rho) g(z); applied everywhere (no shadow mask,
        # like the constant channel)
        if spec.eimp_tilt:
            # quirk F25: rho/z relative to the tilted, co-rotating
            # centrifugal plane.  Normal n leans eimp_tilt from +z toward
            # azimuth psi(t) in the orbit_state convention
            # (u(psi) = (-sin psi, cos psi, 0); psi = 0 -> anti-solar):
            # height = r . n, radius = sqrt(|r|^2 - height^2).
            psi = forces.eimp_tilt_phase - forces.eimp_tilt_omega * t
            z_c = (forces.eimp_tilt_sin * (y * jnp.cos(psi)
                                           - x * jnp.sin(psi))
                   + forces.eimp_tilt_cos * z)
            r2 = x * x + y * y + z * z
            rho_cyl = jnp.sqrt(jnp.maximum(r2 - z_c * z_c, 0.0))
        else:
            rho_cyl = jnp.sqrt(x * x + y * y)
            z_c = z
        if spec.eimp_phi:
            # quirk F28/F29: System III longitude of the packet — azimuth
            # about the SPIN axis (orbit_state convention: phi =
            # atan2(-x, y)) relative to the co-rotating longitude origin
            # at azimuth phase - omega*t, wrapped to [0, 2 pi)
            phi_sys = (jnp.arctan2(-x, y)
                       - (forces.eimp_phi_phase
                          - forces.eimp_rot_omega * t))
            two_pi = 2.0 * jnp.pi
            phi_sys = phi_sys - two_pi * jnp.floor(phi_sys / two_pi)
        if forces.eimp_cp_terms:
            # quirk F29: fully coupled (rho, phi, z) field as a CP sum of
            # separable triples; clamp at 0 (CP truncation can undershoot)
            rate = sum(pl_lookup(f_pl, rho_cyl) * pl_lookup(h_pl, phi_sys)
                       * pl_lookup(g_pl, z_c)
                       for f_pl, h_pl, g_pl in forces.eimp_cp_terms)
            rate = jnp.maximum(rate, 0.0)
        elif forces.eimp_pl_terms:
            # quirk F27: non-separable field as a sum of separable terms;
            # clamp at 0 (SVD truncation can undershoot slightly)
            rate = sum(pl_lookup(f_pl, rho_cyl) * pl_lookup(g_pl, z_c)
                       for f_pl, g_pl in forces.eimp_pl_terms)
            rate = jnp.maximum(rate, 0.0)
        else:
            rate = pl_lookup(forces.eimp_rho_pl, rho_cyl)
            if forces.eimp_z_pl is not None:
                rate = rate * pl_lookup(forces.eimp_z_pl, z_c)
        if spec.eimp_phi and forces.eimp_phi_pl is not None:
            # quirk F28: multiplicative longitude factor h(phi_sys) (the
            # CP form carries its longitude structure in the triples)
            rate = rate * pl_lookup(forces.eimp_phi_pl, phi_sys)
        ion = ion + rate

    return ax, ay, az, ion


def rk5_step(state: PacketState, h, spec: EngineSpec, forces: ForceTable,
             want_delta: bool):
    """One Dormand-Prince step of size ``h`` (per-packet vector) for the whole
    batch.  Returns the stepped state and, if requested, the embedded
    4th-order error estimate per component group (positions, velocities,
    log-frac), mirroring ``rk5.py:21-54``."""
    # python-float coefficients: numpy scalars are strongly typed and would
    # promote float32 packet arrays to float64 under jax_enable_x64
    a = _DP_A.tolist()
    b = _DP_B.tolist()
    bd = _DP_BD.tolist()
    logf0 = jnp.log(jnp.maximum(state.frac, _TINY))

    arad_frozen = None
    if spec.radpres:
        if not spec.radpres_per_stage:
            arad_frozen = radpres_lookup(spec, forces,
                                         state.vy + forces.vrplanet)
        elif (spec.radpres_per_stage == 'tangent'
              and forces.rp_pl.knots.shape[0] > 1):
            arad_frozen = pl_lookup_with_slope(
                forces.rp_pl, state.vy + forces.vrplanet)

    # stage values
    xs = [state.x]
    ys = [state.y]
    zs = [state.z]
    vxs = [state.vx]
    vys = [state.vy]
    vzs = [state.vz]
    accels = []
    ions = []

    # Dormand-Prince stage times (c_i); t counts down, so stage time is
    # t - c_i*h — only evaluated when a time-dependent force (the moving
    # moon or the co-rotating tilted torus) is active
    _DP_C = (0.0, 1.0 / 5.0, 3.0 / 10.0, 4.0 / 5.0, 8.0 / 9.0, 1.0)
    needs_time = (spec.moon_gravity or spec.moon_shadow or spec.eimp_tilt
                  or spec.eimp_phi)

    for n in range(6):
        t_stage = state.t - _DP_C[n] * h if needs_time else None
        ax, ay, az, ion = state_eval(xs[n], ys[n], zs[n], vys[n], spec,
                                     forces, arad_frozen, t=t_stage)
        accels.append((ax, ay, az))
        ions.append(ion)
        if n == 5:
            break
        # build stage n+1
        dx = jnp.zeros_like(state.x)
        dy = jnp.zeros_like(state.x)
        dz = jnp.zeros_like(state.x)
        dvx = jnp.zeros_like(state.x)
        dvy = jnp.zeros_like(state.x)
        dvz = jnp.zeros_like(state.x)
        for i in range(n + 1):
            coef = a[n + 1][i]
            if coef == 0.0:
                continue
            dx = dx + coef * vxs[i]
            dy = dy + coef * vys[i]
            dz = dz + coef * vzs[i]
            dvx = dvx + coef * accels[i][0]
            dvy = dvy + coef * accels[i][1]
            dvz = dvz + coef * accels[i][2]
        xs.append(state.x + h * dx)
        ys.append(state.y + h * dy)
        zs.append(state.z + h * dz)
        vxs.append(state.vx + h * dvx)
        vys.append(state.vy + h * dvy)
        vzs.append(state.vz + h * dvz)

    # 5th-order solution: y + h sum(b_i f_i); b == a[6]
    dx = sum(b[i] * vxs[i] for i in range(6) if b[i] != 0.0)
    dy = sum(b[i] * vys[i] for i in range(6) if b[i] != 0.0)
    dz = sum(b[i] * vzs[i] for i in range(6) if b[i] != 0.0)
    dvx = sum(b[i] * accels[i][0] for i in range(6) if b[i] != 0.0)
    dvy = sum(b[i] * accels[i][1] for i in range(6) if b[i] != 0.0)
    dvz = sum(b[i] * accels[i][2] for i in range(6) if b[i] != 0.0)
    dion = sum(b[i] * ions[i] for i in range(6) if b[i] != 0.0)

    new = PacketState(
        t=state.t - h,
        x=state.x + h * dx, y=state.y + h * dy, z=state.z + h * dz,
        vx=state.vx + h * dvx, vy=state.vy + h * dvy, vz=state.vz + h * dvz,
        frac=jnp.exp(logf0 - h * dion),
        lossfrac=state.lossfrac,
    )

    if not want_delta:
        return new, None

    ex = sum(bd[i] * vxs[i] for i in range(6))
    ey = sum(bd[i] * vys[i] for i in range(6))
    ez = sum(bd[i] * vzs[i] for i in range(6))
    evx = sum(bd[i] * accels[i][0] for i in range(6))
    evy = sum(bd[i] * accels[i][1] for i in range(6))
    evz = sum(bd[i] * accels[i][2] for i in range(6))
    ef = sum(bd[i] * ions[i] for i in range(6))
    delta = tuple(jnp.abs(h * e) for e in (ex, ey, ez, evx, evy, evz, ef))
    return new, delta


def _apply_kills(stepped: PacketState, spec: EngineSpec,
                 surface: Optional[SurfaceTable], forces: ForceTable,
                 outeredge, radius_km, bounce_key, active=None):
    """Surface impact / escape / vanish checks after an accepted step
    (``Output.py:306-324, 394-416``).

    ``active`` restricts the bounce to live lanes: the constant-step driver
    predicates dead lanes through h = 0 (their step is an exact identity),
    and the bounce is the one kill that would otherwise still move a dead
    packet sitting below the surface."""
    r2 = stepped.x ** 2 + stepped.y ** 2 + stepped.z ** 2
    hit = r2 < 1.0
    if active is not None:
        hit = hit & active

    moon_key = None
    if spec.moon_bounce:
        bounce_key, moon_key = jax.random.split(bounce_key)

    if spec.surface_bounce:
        from nexoclom_tpu.ops.surface import bounce_packets
        stepped = bounce_packets(bounce_key, stepped, hit, spec, surface,
                                 forces.gm, radius_km)
        frac = stepped.frac
    else:
        frac = jnp.where(hit, 0.0, stepped.frac)

    if spec.moon_impact:
        # re-impact on the (moving) startpoint moon: removed, or re-emitted
        # when moon_bounce is on; 0.995 margin keeps fresh launches sitting
        # exactly on the surface (d == moon_radius) from instant
        # removal/bounce under f32 rounding
        mx, my = moon_position(forces, stepped.t)
        d2 = ((stepped.x - mx) ** 2 + (stepped.y - my) ** 2 +
              stepped.z ** 2)
        moon_hit = d2 < (0.995 * forces.moon_radius) ** 2
        if active is not None:
            moon_hit = moon_hit & active
        if spec.moon_bounce:
            from nexoclom_tpu.ops.surface import bounce_moon_packets
            stepped = bounce_moon_packets(moon_key,
                                          stepped._replace(frac=frac),
                                          moon_hit, spec, surface, forces)
            frac = stepped.frac
        else:
            frac = jnp.where(moon_hit, 0.0, frac)

    if spec.check_outer_edge:
        frac = jnp.where(r2 > outeredge ** 2, 0.0, frac)
    frac = jnp.where(frac < FRAC_FLOOR, 0.0, frac)
    t = jnp.where(frac == 0.0, 0.0, stepped.t)
    return stepped._replace(frac=frac, t=t)


# ---------------------------------------------------------------------------
# Constant-step driver
# ---------------------------------------------------------------------------

def _stagger_slice(state, j, k: int, shards: int = 1):
    """Stratum ``j`` of each leaf as a (N/k,) pytree.

    Strata are *contiguous per-shard blocks*: packet p belongs to stratum
    (p // m) % k with m = N/(k*shards) — an arbitrary but fixed partition of
    i.i.d. packets, chosen so the slice is a contiguous memory block per
    shard.  The first form tried — stratum = index mod k, i.e. a
    minor-axis dynamic slice of an (N/k, k) reshape — lowered to a strided
    access pattern that cost MORE than the histogram it saved (measured
    1.7e8 vs 2.8e8 packet-steps/s unstrided on v5e); the (shards, k, m)
    middle-axis slice is contiguous per shard and, with the leading axis
    sharded, each device slices locally."""
    def slice_leaf(leaf):
        n = leaf.shape[0]
        m = n // (k * shards)
        block = jax.lax.dynamic_slice_in_dim(
            leaf.reshape(shards, k, m), j, 1, axis=1)
        return block.reshape(shards * m)
    return jax.tree.map(slice_leaf, state)


@partial(jax.jit, static_argnames=('spec', 'nsteps', 'save_history',
                                   'accumulator', 'acc_stride',
                                   'acc_stagger', 'acc_shards'))
def constant_step_driver(state0: PacketState, spec: EngineSpec,
                         forces: ForceTable, surface: Optional[SurfaceTable],
                         step_size, outeredge, radius_km, key,
                         nsteps: int, save_history: bool = True,
                         accumulator=None, acc_init=None,
                         acc_stride: int = 1, acc_stagger: bool = False,
                         acc_shards: int = 1):
    """Fixed-step integration as one ``lax.scan``.

    Returns ``(final_state, history, accumulated)``... specifically
    ``(final, history)`` when no ``accumulator`` is given (API-stable with
    earlier revisions) and ``(final, history, accumulated)`` otherwise.

    ``history`` (if requested) is a PacketState whose leaves have shape
    (nsteps-1, N): the state after steps 1..nsteps-1.  Dead packets emit
    all-zero rows from the step after their death, matching the
    zero-initialised history tensor of the reference (``Output.py:376,419``).

    ``accumulator`` is an optional static callable ``(state, acc) -> acc``
    folding observables (images, LOS sums, histograms) over every snapshot
    *including the initial state* — the fused-observable mode that keeps
    full-history statistics without materialising the (N x nsteps)
    trajectory tensor in HBM.  ``acc_init`` is its starting pytree.
    CONTRACT: the accumulator MUST weight every contribution by
    ``state.frac`` (or a quantity proportional to it).  Dead lanes are
    predicated through h = 0 and arrive with their kill-time state frozen
    and frac == 0 — there is deliberately no per-leaf masking pass (it
    cost ~40% of the step on v5e), so an accumulator weighted by anything
    else (e.g. plain counts) would re-count dead packets every step.
    ``acc_stride`` accumulates only every k-th snapshot (steps 0, k, 2k, ..)
    — statistically valid Monte Carlo subsampling of the (correlated)
    trajectory snapshots; the caller must scale totalsource by the number
    of accumulated snapshots instead of nsteps.  Histogramming costs
    several times the integration on this TPU, so strides directly raise
    fused throughput.

    ``acc_stagger`` (with ``acc_stride=k > 1``) switches to *stratified*
    subsampling: at step t the packets of stratum t (mod k) accumulate —
    an (N/k)-packet histogram every step instead of an N-packet histogram
    every k-th step (strata are contiguous per-shard blocks, see
    ``_stagger_slice``).  Same total sample count and per-packet sampling
    rate, but every timestep is represented (no temporal aliasing against
    periodic trajectories), and the sliced sub-batch keeps the histogram
    k-fold cheaper.  Requires N divisible by k x ``acc_shards``;
    ``acc_shards`` must equal the packet-axis mesh size when sharded so
    each device slices its stratum block locally.  The caller scales
    totalsource by nsteps/k.
    """
    h = jnp.asarray(step_size, state0.x.dtype)
    stagger = acc_stagger and acc_stride > 1
    if stagger and state0.x.shape[0] % (acc_stride * acc_shards):
        raise ValueError(f'staggered accumulation needs the packet count '
                         f'({state0.x.shape[0]}) divisible by the stride '
                         f'({acc_stride}) x shards ({acc_shards})')

    if accumulator is not None:
        if stagger:
            acc0 = accumulator(
                _stagger_slice(state0, jnp.asarray(0, jnp.int32),
                               acc_stride, acc_shards), acc_init)
        else:
            acc0 = accumulator(state0, acc_init)
    else:
        acc0 = None

    def body(carry, step_idx):
        st, acc = carry
        active = st.frac > 0.0
        # Dead lanes are predicated through a zero step size: with h = 0
        # the RK update is an exact identity (x + 0*dx; t - 0; frac floors
        # back to 0 through _apply_kills) and the bounce is masked to live
        # lanes, so no per-leaf where(active, new, old) pass is needed —
        # the selects cost ~40% of the step on v5e (profiled 2026-08).
        h_pkt = jnp.where(active, h, jnp.zeros_like(h))
        stepped, _ = rk5_step(st, h_pkt, spec, forces, want_delta=False)
        bounce_key = jax.random.fold_in(key, step_idx)
        stepped = _apply_kills(stepped, spec, surface, forces, outeredge,
                               radius_km, bounce_key, active=active)
        lossfrac = st.lossfrac + (st.frac - stepped.frac)
        new = stepped._replace(lossfrac=lossfrac)

        if accumulator is not None:
            # dead lanes hold their frozen kill-time state but carry
            # frac == 0; accumulators weight contributions by frac (all of
            # ours do), so they accumulate nothing
            if acc_stride == 1:
                acc = accumulator(new, acc)
            elif stagger:
                acc = accumulator(
                    _stagger_slice(new, step_idx % acc_stride,
                                   acc_stride, acc_shards), acc)
            else:
                acc = jax.lax.cond(step_idx % acc_stride == 0,
                                   lambda m, a: accumulator(m, a),
                                   lambda m, a: a, new, acc)
        if save_history:
            # dead lanes emit all-zero rows (reference parity, Output.py:376)
            emitted = jax.tree.map(
                lambda leaf: jnp.where(active, leaf, 0.0), new)
        else:
            emitted = None
        return (new, acc), emitted

    (final, acc), history = jax.lax.scan(body, (state0, acc0),
                                         jnp.arange(1, nsteps))
    if accumulator is None:
        return final, history
    return final, history, acc


# ---------------------------------------------------------------------------
# Adaptive-step driver
# ---------------------------------------------------------------------------

def _adaptive_machinery(spec: EngineSpec, forces: ForceTable,
                        surface: Optional[SurfaceTable], resolution,
                        outeredge, radius_km, key, dtype,
                        collect_stats: bool = False):
    """The single-iteration core of the adaptive driver: returns
    ``(moretogo, body)`` where ``body`` advances a ``(state, h, it[,
    stats...])`` carry by ONE step-control iteration (trial step, error
    test, accept/reject, kills, h update — Output.py:221-346 parity; see
    :func:`adaptive_step_driver`).  Shared by the monolithic while_loop
    driver and the in-loop pool-refill driver (:func:`adaptive_pool_loop`)
    so step-control behavior cannot drift between them."""
    res = jnp.asarray(resolution, dtype)
    resx = res
    resv = 0.1 * res
    resf = res

    def moretogo(st):
        return (st.t > res) & (st.frac > 0.0)

    def body(carry):
        st, h, it = carry[:3]
        active = moretogo(st)
        h_eff = jnp.minimum(h, st.t)
        h_eff = jnp.maximum(h_eff, jnp.asarray(1e-30, dtype))

        stepped, delta = rk5_step(st, h_eff, spec, forces, want_delta=True)
        ex, ey, ez, evx, evy, evz, ef = delta

        scale_x = resx + jnp.abs(stepped.x) * resx
        scale_y = resx + jnp.abs(stepped.y) * resx
        scale_z = resx + jnp.abs(stepped.z) * resx
        scale_vx = resv + jnp.abs(stepped.vx) * resv
        scale_vy = resv + jnp.abs(stepped.vy) * resv
        scale_vz = resv + jnp.abs(stepped.vz) * resv
        scale_f = resf + jnp.abs(stepped.frac) * resf

        errmax = jnp.maximum(ex / scale_x, ey / scale_y)
        errmax = jnp.maximum(errmax, ez / scale_z)
        errmax = jnp.maximum(errmax, evx / scale_vx)
        errmax = jnp.maximum(errmax, evy / scale_vy)
        errmax = jnp.maximum(errmax, evz / scale_vz)
        errmax = jnp.maximum(errmax, ef / scale_f)

        # guard: reject growth of frac beyond tolerance (Output.py:291)
        frac_grew = (stepped.frac - st.frac) > scale_f
        errmax = jnp.where(frac_grew & (errmax > 1.0), 1.1, errmax)

        # tiny-error: retry with 10x step (Output.py:294-296; such packets
        # are classified "not good" because errmax is reset to exactly 1)
        noerr = errmax < 1e-7
        errmax = jnp.where(noerr, 1.0, errmax)
        h_big = jnp.where(noerr, h_eff * 10.0, h_eff)

        good = active & (errmax < 1.0)

        bounce_key = jax.random.fold_in(key, it)
        killed = _apply_kills(stepped, spec, surface, forces, outeredge,
                              radius_km, bounce_key)
        killed = killed._replace(
            lossfrac=st.lossfrac + (st.frac - killed.frac))

        new_state = jax.tree.map(
            lambda new_leaf, old_leaf: jnp.where(good, new_leaf, old_leaf),
            killed, st)

        h_grow = 0.95 * h_eff * errmax ** -0.2
        h_shrink = jnp.maximum(0.95 * h_big * errmax ** -0.25, 0.1 * h_big)
        new_h = jnp.where(active, jnp.where(good, h_grow, h_shrink), h)

        if not collect_stats:
            return new_state, new_h, it + 1
        accepted, attempted, done_at = carry[3:]
        accepted = accepted + good.astype(jnp.int32)
        attempted = attempted + active.astype(jnp.int32)
        finished = active & ~moretogo(new_state)
        done_at = jnp.where(finished, it + 1, done_at)
        return new_state, new_h, it + 1, accepted, attempted, done_at

    return moretogo, body


@partial(jax.jit, static_argnames=('spec', 'max_iterations',
                                   'collect_stats', 'inner_steps',
                                   'return_h'))
def adaptive_step_driver(state0: PacketState, spec: EngineSpec,
                         forces: ForceTable, surface: Optional[SurfaceTable],
                         resolution, outeredge, radius_km, key,
                         initial_step=1000.0, max_iterations: int = 100000,
                         collect_stats: bool = False,
                         inner_steps: int = 1, return_h: bool = False):
    """Adaptive integration as one ``lax.while_loop`` with per-packet step
    sizes and lockstep predication.

    Prefer :func:`adaptive_step_driver_baked` on TPU: with the tables
    passed as ARGUMENTS this loop runs 4x slower per iteration on axon
    v5e than with them baked as compile-time constants (8.45 vs 2.15
    ms/iter at 1M lanes, 2026-08; the constant-step scan shows no such
    gap).

    Error-control parity with ``Output.py:221-346``; see module docstring.
    Returns ``(final_state, iterations)``, or with
    ``collect_stats=True`` ``(final_state, iterations, stats)`` where
    ``stats`` is a dict of per-packet arrays — ``accepted`` (good steps),
    ``attempted`` (iterations spent active), ``done_at`` (iteration at
    which the packet finished; max_iterations if it never did) — for
    lockstep-divergence analysis (docs/scaling.md).

    ``inner_steps``: adaptive iterations per while-loop cond evaluation
    (an unrolled ``fori_loop`` inside the body).  Identical trajectories —
    finished packets stay predicated — but the loop can overrun by up to
    inner_steps-1 all-dead iterations at the end.  Measured no effect on
    v5e (the body, not the cond, is the cost).

    ``return_h`` appends the per-packet step sizes to the return tuple, and
    ``initial_step`` may be a per-packet array — together these let a host
    orchestrator run the loop in segments (``max_iterations``), compact the
    live packets between segments, and resume without re-ramping h."""
    dtype = state0.x.dtype
    moretogo, body = _adaptive_machinery(spec, forces, surface, resolution,
                                         outeredge, radius_km, key, dtype,
                                         collect_stats)

    def cond(carry):
        st, h, it = carry[:3]
        return jnp.any(moretogo(st)) & (it < max_iterations)

    if inner_steps > 1:
        single = body

        def body(carry):
            return jax.lax.fori_loop(0, inner_steps,
                                     lambda _, c: single(c), carry,
                                     unroll=True)

    h0 = jnp.broadcast_to(jnp.asarray(initial_step, dtype),
                          state0.t.shape)
    carry0 = (state0, h0, jnp.asarray(0, jnp.int32))
    if collect_stats:
        zeros = jnp.zeros_like(state0.t, dtype=jnp.int32)
        carry0 = carry0 + (zeros, zeros,
                           jnp.where(moretogo(state0), max_iterations, 0)
                           .astype(jnp.int32))
    out = jax.lax.while_loop(cond, body, carry0)
    final, iterations = out[0], out[2]
    ret = (final, iterations)
    if collect_stats:
        ret = ret + ({'accepted': out[3], 'attempted': out[4],
                      'done_at': out[5]},)
    if return_h:
        ret = ret + (out[1],)
    return ret


_DIGEST_CACHE: dict = {}   # id(leaf) -> (weakref, digest)
_DIGEST_CACHE_MAX = 512


def _leaf_digest(leaf):
    """SHA-1 content digest of one array leaf, memoized per live object:
    digesting a ForceTable pulls every leaf to the host, so rehashing the
    same tables on every baked-driver call (and every segment of
    adaptive_compacting_run) would pay a device->host transfer each time
    (advisor round 2).  The id key is validated through a weakref — a
    recycled id for a different object misses cleanly."""
    import weakref
    key = id(leaf)
    hit = _DIGEST_CACHE.get(key)
    if hit is not None and hit[0]() is leaf:
        return hit[1]
    arr = np.asarray(leaf)
    digest = (arr.shape, str(arr.dtype),
              hashlib.sha1(np.ascontiguousarray(arr).tobytes()).hexdigest())
    try:
        ref = weakref.ref(leaf)
    except TypeError:
        return digest           # not weakref-able (python scalar): skip
    if len(_DIGEST_CACHE) >= _DIGEST_CACHE_MAX:
        _DIGEST_CACHE.clear()   # drop stale ids; entries are cheap to rebuild
    _DIGEST_CACHE[key] = (ref, digest)
    return digest


def _content_key(tree):
    """Hashable digest of a pytree's array contents (for the baked-driver
    compile cache)."""
    leaves, treedef = jax.tree.flatten(tree)
    return tuple([str(treedef)] + [_leaf_digest(leaf) for leaf in leaves])


_BAKED_ADAPTIVE_CACHE: dict = {}
_BAKED_ADAPTIVE_CACHE_MAX = 16


def adaptive_step_driver_baked(state0: PacketState, spec: EngineSpec,
                               forces: ForceTable,
                               surface: Optional[SurfaceTable],
                               resolution, outeredge, radius_km, key,
                               initial_step=1000.0,
                               max_iterations: int = 100000,
                               collect_stats: bool = False,
                               inner_steps: int = 1,
                               return_h: bool = False):
    """:func:`adaptive_step_driver` with the physics tables and control
    scalars baked into the executable as COMPILE-TIME CONSTANTS.

    On axon v5e the while-loop runs 4x slower when its loop-invariant
    inputs (ForceTable/SurfaceTable/scalars) arrive as jit ARGUMENTS
    instead of embedded constants — measured 8.45 vs 2.15 ms/iteration at
    1M lanes over a full 2899-iteration run, identical results
    (docs/scaling.md, 2026-08).  The constant-step scan shows NO such
    gap, so only the adaptive driver gets the baked variant.

    Each distinct physics configuration compiles once (keyed on the table
    CONTENTS; persistent-cached across processes like every other engine
    graph).  The packet state and the RNG key stay arguments — new seeds
    and batches of the same shape do not recompile.  Per-packet
    ``initial_step`` arrays (the compacting orchestrator) also stay
    arguments."""
    stepper_args = ()
    if np.ndim(initial_step) == 0:
        h_kind = ('scalar', float(initial_step))
    else:
        h_kind = ('array',)
        stepper_args = (initial_step,)
    cache_key = (spec, _content_key(forces), _content_key(surface),
                 float(resolution), float(outeredge), float(radius_km),
                 h_kind, max_iterations, collect_stats, inner_steps,
                 return_h)
    fn = _BAKED_ADAPTIVE_CACHE.get(cache_key)
    if fn is None:
        if len(_BAKED_ADAPTIVE_CACHE) >= _BAKED_ADAPTIVE_CACHE_MAX:
            _BAKED_ADAPTIVE_CACHE.pop(next(iter(_BAKED_ADAPTIVE_CACHE)))
        if h_kind[0] == 'scalar':
            fn = jax.jit(lambda s, k: adaptive_step_driver(
                s, spec, forces, surface, resolution, outeredge, radius_km,
                k, initial_step=initial_step,
                max_iterations=max_iterations, collect_stats=collect_stats,
                inner_steps=inner_steps, return_h=return_h))
        else:
            fn = jax.jit(lambda s, k, h0: adaptive_step_driver(
                s, spec, forces, surface, resolution, outeredge, radius_km,
                k, initial_step=h0,
                max_iterations=max_iterations, collect_stats=collect_stats,
                inner_steps=inner_steps, return_h=return_h))
        _BAKED_ADAPTIVE_CACHE[cache_key] = fn
    return fn(state0, key, *stepper_args)


# Validated adaptive device-batch envelope: 1M- and 2M-lane while_loops are
# validated on axon v5e; a 4M-lane adaptive run faulted the TPU worker once
# ("kernel fault", 2026-08 — CLAUDE.md).  Larger batches run as sequential
# sub-batches instead of handing the chip a single oversized loop.  The
# reference caps its own per-iteration batch for memory instead
# (Input.py:215-233); here the cap is a hardware-stability envelope.
ADAPTIVE_LANE_ENVELOPE = 1 << 21


def adaptive_step_driver_chunked(state0: PacketState, spec: EngineSpec,
                                 forces: ForceTable,
                                 surface: Optional[SurfaceTable],
                                 resolution, outeredge, radius_km, key,
                                 envelope: int = ADAPTIVE_LANE_ENVELOPE,
                                 **kwargs):
    """:func:`adaptive_step_driver_baked`, auto-split into sequential
    sub-batches of at most ``envelope`` lanes.

    Batches within the envelope pass straight through.  Larger batches are
    sliced; the tail slice is PADDED with dead lanes (all-zero leaves:
    t = 0, frac = 0, so ``moretogo`` is False from iteration 0) so every
    sub-batch shares one compiled executable.  Lanes are physically
    independent — the only cross-lane coupling is the loop's all-done
    predicate — so per-packet results are identical to a monolithic run
    except the bounce RNG stream (the key is folded per sub-batch; both
    streams are equally valid, like the compacting orchestrator's).

    Returns ``(final_state, iterations)`` with ``iterations`` the MAXIMUM
    over sub-batches (what a monolithic loop would have run).
    """
    n = state0.x.shape[0]
    if n <= envelope:
        return adaptive_step_driver_baked(
            state0, spec, forces, surface, resolution, outeredge, radius_km,
            key, **kwargs)
    for unsupported in ('collect_stats', 'return_h'):
        if kwargs.get(unsupported):
            raise ValueError(f'adaptive_step_driver_chunked does not '
                             f'support {unsupported} above the envelope '
                             f'({n} > {envelope} lanes); run sub-batches '
                             f'explicitly')
    if np.ndim(kwargs.get('initial_step', 1000.0)) != 0:
        raise ValueError('adaptive_step_driver_chunked requires a scalar '
                         'initial_step above the envelope')

    finals = []
    iterations = 0
    for i, start in enumerate(range(0, n, envelope)):
        stop = min(start + envelope, n)
        pad = envelope - (stop - start)
        sub = jax.tree.map(
            lambda leaf: (leaf[start:stop] if pad == 0 else
                          jnp.concatenate([leaf[start:stop],
                                           jnp.zeros(pad, leaf.dtype)])),
            state0)
        fin, iters = adaptive_step_driver_baked(
            sub, spec, forces, surface, resolution, outeredge, radius_km,
            jax.random.fold_in(key, i), **kwargs)
        if pad:
            fin = jax.tree.map(lambda leaf: leaf[:stop - start], fin)
        finals.append(fin)
        iterations = max(iterations, int(iters))
    final = jax.tree.map(lambda *leaves: jnp.concatenate(leaves), *finals)
    return final, jnp.asarray(iterations, jnp.int32)


def adaptive_compacting_run(state0: PacketState, spec: EngineSpec,
                            forces: ForceTable,
                            surface: Optional[SurfaceTable],
                            resolution, outeredge, radius_km, key,
                            segment: int = 512,
                            compact_threshold: float = 0.5,
                            min_batch: int = 16384,
                            initial_step=1000.0,
                            max_total_iterations: int = 100000):
    """Segmented adaptive integration with host-side live-lane compaction.

    The single-while-loop driver wastes 63% of its lanes on this workload
    (measured: mean occupancy 37%, p50 finish at iteration 1028 of 2777 —
    docs/scaling.md): finished packets ride along dead until the stragglers
    converge.  This orchestrator runs the SAME driver in ``segment``-
    iteration slices; between slices it writes finished packets out and,
    when live lanes drop below ``compact_threshold``, gathers survivors
    (host-side — device gather is a scalar loop on this TPU) into the next
    power-of-two batch ≥ ``min_batch``.  Per-packet step sizes carry across
    segments, so trajectories match the monolithic driver's step-control
    behavior (bounce RNG streams differ per segment; both are valid).

    Each distinct batch size compiles its own executable — worthwhile for
    production sweeps where the persistent cache amortises it, not for
    one-offs.

    Returns ``(final_state, total_iterations)`` with the final state as a
    host-side PacketState in the original packet order.
    """
    fields = PacketState._fields
    n = state0.x.shape[0]
    np_dtype = np.asarray(state0.x[:1]).dtype
    final_np = {f: np.zeros(n, np_dtype) for f in fields}
    alive_idx = np.arange(n)
    valid = np.ones(n, bool)          # False for compaction padding lanes
    state = state0
    h = initial_step
    res = float(resolution)
    seg_i = 0
    total_iters = 0

    @jax.jit
    def count_live(st):
        return jnp.sum((st.t > res) & (st.frac > 0.0))

    def pull(final):
        return {f: np.asarray(getattr(final, f)) for f in fields}

    def write_back(leaves):
        # dead/finished lanes are frozen by predication, so (re)writing
        # them at any later pull is idempotent
        done = (~((leaves['t'] > res) & (leaves['frac'] > 0.0))) & valid
        if done.any():
            idx = alive_idx[done]
            for f in fields:
                final_np[f][idx] = leaves[f][done]
        return done

    final = state0
    while total_iters < max_total_iterations:
        seg_key = jax.random.fold_in(key, seg_i)
        # baked variant: same 4x while-iteration win; per-packet h stays
        # an argument, so only distinct batch SHAPES compile (which the
        # segmented orchestrator pays under the plain jit too)
        final, iters, h_out = adaptive_step_driver_baked(
            state, spec, forces, surface, resolution, outeredge, radius_km,
            seg_key, initial_step=h, max_iterations=segment, return_h=True)
        total_iters += int(iters)
        # ONE scalar transfer per segment; leaves are pulled only when a
        # compaction (or completion) actually happens — per-leaf pulls every
        # segment measured 0.8x (slower than no compaction at all) through
        # the ~50 ms-per-transfer axon path
        n_live = int(count_live(final))
        cur_n = int(final.t.shape[0])
        if n_live == 0:
            write_back(pull(final))
            break
        target = max(min_batch, 1 << int(np.ceil(np.log2(n_live))))
        if n_live < compact_threshold * cur_n and target < cur_n:
            leaves = pull(final)
            done = write_back(leaves)
            more = valid & ~done
            keep = np.nonzero(more)[0]
            pad = target - n_live
            new_leaves = {}
            for f in fields:
                col = np.empty(target, np_dtype)
                col[:n_live] = leaves[f][keep]
                col[n_live:] = 0.0      # t=0, frac=0: moretogo is False
                new_leaves[f] = jnp.asarray(col)
            h_np = np.asarray(h_out)
            h_col = np.full(target, 1.0, np_dtype)
            h_col[:n_live] = h_np[keep]
            h = jnp.asarray(h_col)
            alive_idx = np.concatenate([alive_idx[keep], np.zeros(pad, int)])
            valid = np.concatenate([np.ones(n_live, bool),
                                    np.zeros(pad, bool)])
            state = PacketState(**new_leaves)
        else:
            state = final
            h = h_out
        seg_i += 1
    else:
        # iteration budget exhausted: flush the current batch so unfinished
        # (and any unflushed finished) lanes return their real partial
        # state, matching the monolithic driver's max_iterations behavior
        leaves = pull(final)
        idx = alive_idx[valid]
        for f in fields:
            final_np[f][idx] = leaves[f][valid]
    return PacketState(**final_np), total_iters


@jax.jit
def _sort_finished_first(state: PacketState, h, ids, res):
    """Device-side compaction primitive: stable key-value sort of the whole
    lane set with finished lanes first (alive = 0/1 ascending key).

    ``jax.lax.sort`` with trailing operands is a single sort HLO — no
    general gather, which lowers to a scalar loop on this TPU (CLAUDE.md).
    Returns the sorted ``(state, h, ids)``.
    """
    alive = ((state.t > res) & (state.frac > 0.0)).astype(jnp.int32)
    out = jax.lax.sort((alive,) + tuple(state) + (h, ids),
                       num_keys=1, is_stable=True)
    n_fields = len(PacketState._fields)
    return (PacketState(*out[1:1 + n_fields]), out[1 + n_fields],
            out[2 + n_fields])


@partial(jax.jit, static_argnames=('k',), donate_argnums=(0, 1, 2, 4, 5))
def _pool_swap(state: PacketState, h, ids, pool: PacketState,
               out_state: PacketState, out_ids, next_idx, out_pos, res, h0,
               *, k: int):
    """Device-side lane swap: retire the k most-finished lanes into the
    output buffer and replace them with the next k pool packets.

    Everything stays in HBM: the finished block goes into ``out_state``
    at ``out_pos`` via ``dynamic_update_slice`` (contiguous — original
    packet order is restored from ``out_ids`` on the host at the END),
    and fresh packets come from ``pool`` at ``next_idx`` via
    ``dynamic_slice``.  No gather/scatter (both lower to scalar loops on
    this TPU — CLAUDE.md) and no host transfer; the caller's only
    per-segment sync is one live-lane count.
    """
    state_s, h_s, ids_s = _sort_finished_first(state, h, ids, res)
    done = jax.tree.map(lambda leaf: leaf[:k], state_s)
    out_state = jax.tree.map(
        lambda buf, blk: jax.lax.dynamic_update_slice_in_dim(
            buf, blk, out_pos, 0), out_state, done)
    out_ids = jax.lax.dynamic_update_slice_in_dim(out_ids, ids_s[:k],
                                                  out_pos, 0)
    fresh = jax.tree.map(
        lambda leaf: jax.lax.dynamic_slice_in_dim(leaf, next_idx, k), pool)
    new_state = jax.tree.map(
        lambda fr, leaf: jnp.concatenate([fr, leaf[k:]]), fresh, state_s)
    new_h = jnp.concatenate([jnp.full((k,), h0, h_s.dtype), h_s[k:]])
    new_ids = jnp.concatenate(
        [next_idx + jnp.arange(k, dtype=jnp.int32), ids_s[k:]])
    return new_state, new_h, new_ids, out_state, out_ids


@partial(jax.jit, donate_argnums=(0, 2))
def _pool_flush(out_state: PacketState, state: PacketState, out_ids, ids,
                out_pos):
    """Write the final batch (stragglers + never-swapped lanes) into the
    output buffer; one device op, then the caller pulls the buffer once."""
    out_state = jax.tree.map(
        lambda buf, blk: jax.lax.dynamic_update_slice_in_dim(
            buf, blk, out_pos, 0), out_state, state)
    out_ids = jax.lax.dynamic_update_slice_in_dim(out_ids, ids, out_pos, 0)
    return out_state, out_ids


def adaptive_pool_run(state0: PacketState, spec: EngineSpec,
                      forces: ForceTable, surface: Optional[SurfaceTable],
                      resolution, outeredge, radius_km, key,
                      batch: int = 1 << 20, segment: int = 256,
                      initial_step: float = 1000.0,
                      max_total_iterations: int = 10 ** 7,
                      inner_steps: int = 1,
                      refill_fraction: float = 0.5):
    """Adaptive integration of a large packet pool through a fixed-width
    device batch with FULLY DEVICE-RESIDENT compaction and refill.

    The monolithic while_loop wastes lanes on finished packets (measured
    36% mean occupancy on the Ca case — docs/scaling.md): p50 of packets
    finish by iteration ~1000 of ~2800 and ride dead to the end.  Two
    orchestrations were measured before this one (docs/scaling.md):
    host-side compaction (0.88x — per-leaf device->host pulls through the
    ~50 ms axon transfer path) and a host-mediated pool (0.66x — 36 MB of
    finished/fresh blocks crossing the tunnel per refill).  The lesson is
    that NOTHING bulk may cross the host boundary mid-run, so here every
    byte stays in HBM:

    1. the whole pool is pushed to the device ONCE (padded with dead
       filler lanes to a refill multiple); an (n_pad,) output buffer and
       id ring live beside it;
    2. the baked driver runs ``segment`` iterations on the fixed-width
       batch (per-packet h rides across segments via ``return_h``);
    3. ONE scalar transfer per segment: the live-lane count;
    4. when at least batch/2 lanes are finished, :func:`_pool_swap` sorts
       the lanes finished-first ON DEVICE (``lax.sort`` key-value — no
       gather), retires the first batch/2 into the output buffer at the
       next contiguous offset (``dynamic_update_slice``) and refills from
       the pool (``dynamic_slice``) — zero host bytes;
    5. when the pool is dry, the remaining stragglers drain segment by
       segment (occupancy decays only over this final tail), the batch is
       flushed into the buffer, and the host pulls buffer + ids once,
       restoring original packet order by numpy indexing.

    Lanes are physically independent (the loop's all-done predicate is
    the only coupling), so per-packet results equal the monolithic
    driver's for deterministic physics; bounce RNG streams differ per
    segment (folded key), like :func:`adaptive_compacting_run`.

    Returns ``(final_state, total_iterations)`` with the final state a
    host-side PacketState in the original packet order.
    """
    fields = PacketState._fields
    n = state0.x.shape[0]
    dtype = state0.x.dtype
    res = float(resolution)
    if n <= batch:
        final, iters = adaptive_step_driver_baked(
            state0, spec, forces, surface, resolution, outeredge, radius_km,
            key, initial_step=initial_step,
            max_iterations=max_total_iterations, inner_steps=inner_steps)
        return (PacketState(**{f: np.asarray(getattr(final, f))
                               for f in fields}), int(iters))

    # refill quantum: lane occupancy rides in [1 - refill_fraction, 1]
    # between swaps, so a smaller fraction trades more sort passes for a
    # higher occupancy floor
    k_refill = max(1, int(batch * refill_fraction))
    # pad the pool so every refill slices a full k_refill block; filler
    # lanes are all-zero (t = 0, frac = 0 -> dead from iteration 0) and
    # their ids (>= n) are dropped at the host reorder
    n_pad = batch + -(-(n - batch) // k_refill) * k_refill
    pool = jax.tree.map(
        lambda leaf: jnp.concatenate(
            [leaf, jnp.zeros((n_pad - n,), leaf.dtype)]), state0)
    out_state = jax.tree.map(lambda leaf: jnp.zeros((n_pad,), leaf.dtype),
                             state0)
    out_ids = jnp.full((n_pad,), -1, jnp.int32)

    state = jax.tree.map(lambda leaf: leaf[:batch], pool)
    ids = jnp.arange(batch, dtype=jnp.int32)
    h = jnp.full((batch,), initial_step, dtype)
    h0 = jnp.asarray(initial_step, dtype)
    res_dev = jnp.asarray(res, dtype)
    next_idx = batch
    out_pos = 0
    total_iters = 0
    seg_i = 0

    while total_iters < max_total_iterations:
        seg_key = jax.random.fold_in(key, seg_i)
        seg_i += 1
        state, iters, h = adaptive_step_driver_baked(
            state, spec, forces, surface, resolution, outeredge, radius_km,
            seg_key, initial_step=h, max_iterations=segment, return_h=True,
            inner_steps=inner_steps)
        # the ONLY sync per segment: one fetch for both control scalars
        # (separate int() pulls pay the ~50 ms axon round trip twice)
        iters_n, n_live = jax.device_get(
            (iters, _count_live(state, res_dev)))
        total_iters += int(iters_n)
        n_live = int(n_live)
        n_done = batch - n_live
        if n_live == 0 and next_idx >= n_pad:
            break
        if n_done >= k_refill and next_idx < n_pad:
            state, h, ids, out_state, out_ids = _pool_swap(
                state, h, ids, pool, out_state, out_ids,
                jnp.asarray(next_idx, jnp.int32),
                jnp.asarray(out_pos, jnp.int32), res_dev, h0, k=k_refill)
            next_idx += k_refill
            out_pos += k_refill

    # flush the final batch (finished stragglers, never-swapped lanes, or
    # — on iteration-budget exhaustion — genuinely unfinished lanes
    # returning partial state), then ONE bulk pull of the whole buffer
    out_state, out_ids = _pool_flush(out_state, state, out_ids, ids,
                                     jnp.asarray(out_pos, jnp.int32))
    ids_np = np.asarray(out_ids)
    valid = (ids_np >= 0) & (ids_np < n)
    idx = ids_np[valid]
    np_dtype = np.asarray(state0.x[:1]).dtype
    final_np = {}
    for f in fields:
        col = np.zeros(n, np_dtype)
        col[idx] = np.asarray(getattr(out_state, f))[valid]
        final_np[f] = col
    return PacketState(**final_np), total_iters


@jax.jit
def _count_live(st: PacketState, res):
    return jnp.sum((st.t > res) & (st.frac > 0.0))


_POOL_LOOP_CACHE: dict = {}
_POOL_LOOP_CACHE_MAX = 8


def adaptive_pool_loop(state0: PacketState, spec: EngineSpec,
                       forces: ForceTable, surface: Optional[SurfaceTable],
                       resolution, outeredge, radius_km, key,
                       batch: int = 1 << 20, swap_every: int = 64,
                       refill_fraction: float = 0.0625,
                       initial_step: float = 1000.0,
                       max_total_iterations: int = 10 ** 7,
                       inner_steps: int = 1, sort_group: int = 1,
                       bake_key: bool = False, _boundary: str = 'cond'):
    """Adaptive pool integration as ONE ``lax.while_loop`` — the refill
    itself lives inside the loop, so the host never intervenes.

    ``bake_key`` embeds the RNG key in the executable as a compile-time
    constant (one compile per seed, content-keyed like the physics
    tables) — the per-seed-baking experiment from the round-3 verdict.
    ``_boundary`` selects timing-experiment scaffolding variants (see
    :func:`_build_pool_loop_fn`); non-default modes return wrong physics
    and exist only for scripts/bench_pool_boundary.py.

    :func:`adaptive_pool_run` still pays per-segment costs that cap it
    near the monolithic rate (measured 2.2e8 at a 16M pool): a ~50 ms
    control-scalar round trip plus dispatch per segment, and refills
    quantized to the segment boundary.  Here the whole orchestration is
    device-side data flow: every ``swap_every`` iterations a ``lax.cond``
    checks (on device) whether ``refill_fraction * batch`` lanes have
    finished and, if so, sorts finished-first and swaps them for the next
    pool block (:func:`_sort_finished_first` + slice/update — no gather).
    The pool, output buffer, and id ring ride in the while-loop carry, so
    XLA aliases them in place in HBM; physics tables and control scalars
    are baked as compile-time constants (the 4x while-loop
    argument-pathology, docs/scaling.md).  The host sees ONE dispatch and
    pulls the output buffer once at the end.

    Same per-packet results as the monolithic BAKED driver
    (:func:`adaptive_step_driver_baked`) for deterministic physics
    (bit-exact, tested on full Ca physics in f32; the argument-passing
    driver differs at f32 ULP level once tables are constant-folded —
    docs/scaling.md platform notes).  Bounce draws differ once a swap has
    reshuffled lane positions — the per-iteration key matches the
    monolithic stream (global iteration counter), but bounce randomness
    is consumed per lane POSITION; both streams are equally valid, the
    same caveat as every segmented orchestrator.  ``swap_every`` must be
    a multiple of ``inner_steps``.  Returns ``(final_state,
    total_iterations)`` with the final state host-side in original packet
    order.
    """
    fields = PacketState._fields
    n = state0.x.shape[0]
    dtype = state0.x.dtype
    _check_pool_knobs(swap_every, inner_steps, refill_fraction)
    if n <= batch:
        final, iters = adaptive_step_driver_baked(
            state0, spec, forces, surface, resolution, outeredge, radius_km,
            key, initial_step=initial_step,
            max_iterations=max_total_iterations, inner_steps=inner_steps)
        return (PacketState(**{f: np.asarray(getattr(final, f))
                               for f in fields}), int(iters))

    k_refill = max(1, int(batch * refill_fraction))
    n_pad = batch + -(-(n - batch) // k_refill) * k_refill
    pool = jax.tree.map(
        lambda leaf: jnp.concatenate(
            [leaf, jnp.zeros((n_pad - n,), leaf.dtype)]), state0)

    key_digest = (hashlib.sha1(np.asarray(key).tobytes()).hexdigest()
                  if bake_key else None)
    cache_key = (spec, _content_key(forces), _content_key(surface),
                 float(resolution), float(outeredge), float(radius_km),
                 float(initial_step), batch, n_pad, swap_every, k_refill,
                 max_total_iterations, inner_steps, sort_group,
                 str(dtype), _boundary, key_digest)

    def build():
        run = _build_pool_loop_fn(
            spec, forces, surface, resolution, outeredge, radius_km, dtype,
            batch, n_pad, k_refill, swap_every, max_total_iterations,
            inner_steps, initial_step, sort_group=sort_group,
            _boundary=_boundary)
        if bake_key:
            key_const = jnp.asarray(key)
            return jax.jit(lambda pool_a: run(pool_a, key_const),
                           donate_argnums=(0,))
        return jax.jit(run, donate_argnums=(0,))

    fn = _pool_loop_cached(cache_key, build)

    out_state, out_ids, it = fn(pool) if bake_key else fn(pool, key)
    ids_np = np.asarray(out_ids)
    valid = (ids_np >= 0) & (ids_np < n)
    idx = ids_np[valid]
    np_dtype = np.asarray(state0.x[:1]).dtype
    final_np = {}
    for f in fields:
        col = np.zeros(n, np_dtype)
        col[idx] = np.asarray(getattr(out_state, f))[valid]
        final_np[f] = col
    return PacketState(**final_np), int(it)


def _check_pool_knobs(swap_every, inner_steps, refill_fraction):
    if swap_every % max(inner_steps, 1):
        raise ValueError('swap_every must be a multiple of inner_steps')
    # k_refill > batch would make the swap predicate (n_done >= k_refill)
    # unsatisfiable: the dispatch would spin with no live lane to advance
    # the iteration counter, so not even max_total_iterations could stop it
    if not 0.0 < refill_fraction <= 1.0:
        raise ValueError('refill_fraction must be in (0, 1], got '
                         f'{refill_fraction!r}')


def _pool_loop_cached(cache_key, build):
    """Shared compiled-program cache for the pool-loop variants."""
    fn = _POOL_LOOP_CACHE.get(cache_key)
    if fn is None:
        if len(_POOL_LOOP_CACHE) >= _POOL_LOOP_CACHE_MAX:
            _POOL_LOOP_CACHE.pop(next(iter(_POOL_LOOP_CACHE)))
        fn = build()
        _POOL_LOOP_CACHE[cache_key] = fn
    return fn


def _build_pool_loop_fn(spec, forces, surface, resolution, outeredge,
                        radius_km, dtype, batch, n_pad, k_refill,
                        swap_every, max_total_iterations, inner_steps,
                        initial_step, sort_group=1, _boundary='cond'):
    """Build the in-loop-refill pool program ``run(pool, key) ->
    (out_state, out_ids, iterations)`` for one device's pool of
    ``n_pad`` packets (:func:`adaptive_pool_loop` for the structure;
    :func:`adaptive_pool_loop_sharded` maps it per mesh shard).

    ``sort_group`` payload arrays share each stable sort op: every sort
    re-runs the key-compare network, so fewer/wider sorts trade compare
    passes against per-op working set (the 11-operand form's 130 MB
    trips XLA's alternate-memory assignment CHECK inside a while/cond
    context on this platform — SIGABRT in memory-space assignment,
    2026-08; groups of ≤4 stay under ~50 MB).  Identical permutation
    for any grouping (stable + shared key).

    Retired packets go to a separate (n_pad,) output buffer rather than
    back into the pool slots their replacements came from: the
    retire-in-place form (pool doubles as output, halving the carry to
    0.6 GB at a 16M f32 pool) showed no reproducible win once the
    apparent variance was traced to HOST LOAD beside the benchmark
    (quiet-host repeats agree within 2% — docs/scaling.md session C);
    this form holds the best measurement (3.20 ms/iter, 2.75e8 accepted
    ps/s at the tuned 64:0.0625 default).

    ``_boundary`` selects TIMING-EXPERIMENT variants that decompose the
    swap-boundary cost (scripts/bench_pool_boundary.py); every mode but
    ``'cond'`` and ``'always'`` produces PHYSICALLY WRONG results (the
    pool never refills) and exists only to time the loop scaffolding:

    * ``'cond'`` — production: reduction + ``lax.cond`` swap.
    * ``'always'`` — correct-physics candidate: sort + slice every
      boundary, swap gated by ``where`` selects — no conditional
      control flow crosses the carry (bit-exact vs ``'cond'`` for
      deterministic physics; bounce draws reshuffle, the standing
      caveat).
    * ``'checkonly'`` — the finished-lane reduction runs but no cond:
      isolates the nested-while restart + reduction cost.
    * ``'condnop'`` — reduction + a ``lax.cond`` whose true branch is a
      1-element touch: isolates the cond carry-crossing cost.
    * ``'nop'`` — no boundary work at all: isolates the bare nested
      restart."""
    res_c = jnp.asarray(float(resolution), dtype)
    h0_c = jnp.asarray(float(initial_step), dtype)
    fields = PacketState._fields

    def run(pool_a, key_a):
        moretogo, body = _adaptive_machinery(
            spec, forces, surface, resolution, outeredge, radius_km,
            key_a, dtype)

        def do_swap(c):
            st, h, it, ids, next_idx, out_pos, pool_c, out_s, out_i = c
            alive_key = ((st.t > res_c) & (st.frac > 0.0)).astype(
                jnp.int32)

            leaves = [getattr(st, f) for f in fields] + [h, ids]
            sorted_leaves = []
            for i in range(0, len(leaves), sort_group):
                grp = leaves[i:i + sort_group]
                sorted_leaves.extend(
                    jax.lax.sort((alive_key, *grp), num_keys=1,
                                 is_stable=True)[1:])
            st = PacketState(*sorted_leaves[:len(fields)])
            h, ids = sorted_leaves[-2], sorted_leaves[-1]
            done = jax.tree.map(lambda leaf: leaf[:k_refill], st)
            out_s = jax.tree.map(
                lambda buf, blk: jax.lax.dynamic_update_slice_in_dim(
                    buf, blk, out_pos, 0), out_s, done)
            out_i = jax.lax.dynamic_update_slice_in_dim(
                out_i, ids[:k_refill], out_pos, 0)
            fresh = jax.tree.map(
                lambda leaf: jax.lax.dynamic_slice_in_dim(
                    leaf, next_idx, k_refill), pool_c)
            st = jax.tree.map(
                lambda fr, leaf: jnp.concatenate([fr, leaf[k_refill:]]),
                fresh, st)
            h = jnp.concatenate(
                [jnp.full((k_refill,), h0_c, h.dtype), h[k_refill:]])
            ids = jnp.concatenate(
                [next_idx + jnp.arange(k_refill, dtype=jnp.int32),
                 ids[k_refill:]])
            return (st, h, it, ids, next_idx + k_refill,
                    out_pos + k_refill, pool_c, out_s, out_i)

        def swap_always(c):
            # Unconditional boundary: sort + slice every trip, the swap
            # GATED by selects instead of a lax.cond — no conditional
            # control flow crosses the 1.2 GB carry.  Physics matches
            # 'cond' bit-exactly for deterministic specs (the sort is a
            # lane permutation; bounce RNG is positional, the standing
            # segmented-orchestrator caveat).  Stale retire writes when
            # pred is false land at a frontier that the next real swap
            # or the final flush overwrites, so they are harmless.
            st, h, it, ids, next_idx, out_pos, pool_c, out_s, out_i = c
            alive_key = ((st.t > res_c) & (st.frac > 0.0)).astype(
                jnp.int32)
            n_done = batch - jnp.sum(alive_key)
            pred = (n_done >= k_refill) & (next_idx + k_refill <= n_pad)

            leaves = [getattr(st, f) for f in fields] + [h, ids]
            sorted_leaves = []
            for i in range(0, len(leaves), sort_group):
                grp = leaves[i:i + sort_group]
                sorted_leaves.extend(
                    jax.lax.sort((alive_key, *grp), num_keys=1,
                                 is_stable=True)[1:])
            st = PacketState(*sorted_leaves[:len(fields)])
            h, ids = sorted_leaves[-2], sorted_leaves[-1]
            done = jax.tree.map(lambda leaf: leaf[:k_refill], st)
            out_s = jax.tree.map(
                lambda buf, blk: jax.lax.dynamic_update_slice_in_dim(
                    buf, blk, out_pos, 0), out_s, done)
            out_i = jax.lax.dynamic_update_slice_in_dim(
                out_i, ids[:k_refill], out_pos, 0)
            # dynamic_slice clamps an exhausted next_idx into range; the
            # garbage block is discarded by the pred selects below
            fresh = jax.tree.map(
                lambda leaf: jax.lax.dynamic_slice_in_dim(
                    leaf, next_idx, k_refill), pool_c)
            st_sw = jax.tree.map(
                lambda fr, leaf: jnp.concatenate([fr, leaf[k_refill:]]),
                fresh, st)
            h_sw = jnp.concatenate(
                [jnp.full((k_refill,), h0_c, h.dtype), h[k_refill:]])
            ids_sw = jnp.concatenate(
                [next_idx + jnp.arange(k_refill, dtype=jnp.int32),
                 ids[k_refill:]])
            st = jax.tree.map(lambda a, b: jnp.where(pred, a, b), st_sw,
                              st)
            h = jnp.where(pred, h_sw, h)
            ids = jnp.where(pred, ids_sw, ids)
            kk = jnp.where(pred, jnp.int32(k_refill), jnp.int32(0))
            return (st, h, it, ids, next_idx + kk, out_pos + kk, pool_c,
                    out_s, out_i)

        def maybe_swap(c):
            if _boundary == 'always':
                return swap_always(c)
            st = c[0]
            next_idx = c[4]
            n_done = batch - jnp.sum(moretogo(st))
            pred = (n_done >= k_refill) & (next_idx + k_refill <= n_pad)
            if _boundary == 'cond':
                return jax.lax.cond(pred, do_swap, lambda x: x, c)
            if _boundary == 'nop':
                return c
            if _boundary == 'checkonly':
                # keep the reduction live (n_done <= batch, so the shift
                # is always 0 but not constant-foldable)
                it = c[2] + (n_done >> 30)
                return (c[0], c[1], it) + c[3:]
            if _boundary == 'condnop':
                def touch(x):
                    out_i = x[8].at[0].set(x[8][0])
                    return x[:8] + (out_i,)
                return jax.lax.cond(pred, touch, lambda x: x, c)
            raise ValueError(f'unknown _boundary mode {_boundary!r}')

        def cond(c):
            st, _, it = c[0], c[1], c[2]
            next_idx = c[4]
            more = jnp.any(moretogo(st))
            if _boundary not in ('cond', 'always'):
                # experiment modes never refill: stop when the first
                # batch drains (the production pred would spin forever)
                return more & (it < max_total_iterations)
            return ((more | (next_idx < n_pad))
                    & (it < max_total_iterations))

        if inner_steps > 1:
            single = body

            def body(sc):
                return jax.lax.fori_loop(0, inner_steps,
                                         lambda _, c: single(c), sc,
                                         unroll=True)

        def body_fused(c):
            # NESTED loop structure: the inner while_loop carries ONLY
            # (state, h, it) — the first fused form threaded the 64 MB
            # pool/output buffers through a per-iteration lax.cond,
            # which broke XLA's carry aliasing and doubled the
            # iteration cost (4.43 vs 2.15 ms measured); here the
            # buffers cross a loop boundary once per swap_every
            # iterations, and the hot body is graph-identical to the
            # monolithic driver's
            st, h, it = c[0], c[1], c[2]
            limit = it + swap_every

            def icond(ic):
                st_, _, it_ = ic
                return (jnp.any(moretogo(st_)) & (it_ < limit)
                        & (it_ < max_total_iterations))

            st, h, it = jax.lax.while_loop(icond, body, (st, h, it))
            return maybe_swap((st, h, it) + c[3:])

        state = jax.tree.map(lambda leaf: leaf[:batch], pool_a)
        carry0 = (state,
                  jnp.full((batch,), h0_c, dtype),
                  jnp.asarray(0, jnp.int32),
                  jnp.arange(batch, dtype=jnp.int32),
                  jnp.asarray(batch, jnp.int32),
                  jnp.asarray(0, jnp.int32),
                  pool_a,
                  jax.tree.map(
                      lambda leaf: jnp.zeros((n_pad,), leaf.dtype),
                      pool_a),
                  jnp.full((n_pad,), -1, jnp.int32))
        out = jax.lax.while_loop(cond, body_fused, carry0)
        st, _, it, ids, _, out_pos = out[:6]
        out_s, out_i = out[7], out[8]
        out_s = jax.tree.map(
            lambda buf, blk: jax.lax.dynamic_update_slice_in_dim(
                buf, blk, out_pos, 0), out_s, st)
        out_i = jax.lax.dynamic_update_slice_in_dim(out_i, ids,
                                                    out_pos, 0)
        return out_s, out_i, it

    return run


def adaptive_pool_loop_sharded(state0: PacketState, spec: EngineSpec,
                               forces: ForceTable,
                               surface: Optional[SurfaceTable],
                               resolution, outeredge, radius_km, key, mesh,
                               axis: str = 'packets',
                               batch: int = 1 << 20, swap_every: int = 64,
                               refill_fraction: float = 0.0625,
                               initial_step: float = 1000.0,
                               max_total_iterations: int = 10 ** 7,
                               inner_steps: int = 1, sort_group: int = 1,
                               shard_offset: int = 0):
    """Multi-chip :func:`adaptive_pool_loop`: one INDEPENDENT pool loop
    per mesh shard via ``jax.shard_map`` — zero collectives.

    The sharded *monolithic* driver (plain ``jax.sharding`` on the
    packet axis) pays a cross-device all-done reduction every cond
    check, and every chip spins until the globally slowest lane
    finishes.  Here each device owns a contiguous block of the pool and
    drains it with its own in-loop refill: the while-loop trip count
    differs per device (no collectives in cond or body, so SPMD
    divergence is safe), occupancy is per-chip, and the only
    synchronisation is the final output pull.  This is the production
    multi-chip form of the reference's default adaptive mode
    (``input_classes.py:1085-1092``).

    Per-shard bounce RNG streams derive from ``fold_in(key,
    shard_index + shard_offset)`` — independent per shard, the standing
    segmented-orchestrator caveat; deterministic physics is bit-exact vs
    the monolithic driver (tested).  Returns host-side numpy state in
    original packet order plus the max per-shard iteration count.

    Multi-process meshes route to :func:`_pool_loop_multiprocess`: one
    independent local run per process over the packet-axis shards it
    owns (zero cross-process device collectives — the Condor fan-out
    role, ``utilities/Condor.py:21-105``), joined by one host-side
    allgather at the end.  Each process must hold its own packets
    locally — a state sharded over the mesh (``parallel.mesh.
    shard_state`` / ``distributed.shard_host_local_state``) or
    host-replicated arrays both qualify.

    ``shard_offset`` shifts the per-shard RNG fold (internal: the
    multi-process path uses it so shard s draws the same stream no
    matter which process runs it).
    """
    fields = PacketState._fields
    n = state0.x.shape[0]
    dtype = state0.x.dtype
    n_shards = int(mesh.shape[axis])
    _check_pool_knobs(swap_every, inner_steps, refill_fraction)
    # multi-process meshes decompose BEFORE any fallback: a sharded
    # state on a multi-host mesh would otherwise die later in np.asarray
    # with an obscure non-addressable-array error
    if n_shards > 1 and any(d.process_index != jax.process_index()
                            for d in np.asarray(mesh.devices).flat):
        return _pool_loop_multiprocess(
            state0, spec, forces, surface, resolution, outeredge,
            radius_km, key, mesh, axis=axis, batch=batch,
            swap_every=swap_every, refill_fraction=refill_fraction,
            initial_step=initial_step,
            max_total_iterations=max_total_iterations,
            inner_steps=inner_steps, sort_group=sort_group)
    if n_shards == 1 or n <= batch:
        return adaptive_pool_loop(
            state0, spec, forces, surface, resolution, outeredge, radius_km,
            key, batch=batch, swap_every=swap_every,
            refill_fraction=refill_fraction, initial_step=initial_step,
            max_total_iterations=max_total_iterations,
            inner_steps=inner_steps, sort_group=sort_group)

    k_refill = max(1, int(batch * refill_fraction))
    per_shard = -(-n // n_shards)
    extra = max(0, per_shard - batch)
    n_pad_local = batch + -(-extra // k_refill) * k_refill
    # BALANCED placement: shard s owns original packets
    # [s*per_shard, (s+1)*per_shard) plus local zero padding — end-padding
    # the global array instead would hand the trailing shards nothing but
    # zeros whenever per_shard < batch and leave those chips idle.
    # Zero-padding packets have t=0, frac=0 -> immediately finished; they
    # cycle out through the refill and are dropped by the id mask below.
    def place(leaf):
        leaf = jnp.concatenate(
            [leaf, jnp.zeros((n_shards * per_shard - n,), leaf.dtype)])
        leaf = leaf.reshape(n_shards, per_shard)
        leaf = jnp.pad(leaf, ((0, 0), (0, n_pad_local - per_shard)))
        return leaf.reshape(-1)

    pool = jax.tree.map(place, state0)

    cache_key = (spec, _content_key(forces), _content_key(surface),
                 float(resolution), float(outeredge), float(radius_km),
                 float(initial_step), batch, n_pad_local, swap_every,
                 k_refill, max_total_iterations, inner_steps,
                 sort_group, str(dtype), mesh, axis, shard_offset)

    def build():
        run = _build_pool_loop_fn(
            spec, forces, surface, resolution, outeredge, radius_km, dtype,
            batch, n_pad_local, k_refill, swap_every,
            max_total_iterations, inner_steps, initial_step,
            sort_group=sort_group)

        def shard_body(pool_local, key_a):
            shard = jax.lax.axis_index(axis) + shard_offset
            out_s, out_i, it = run(pool_local,
                                   jax.random.fold_in(key_a, shard))
            return out_s, out_i, it[None]

        p_packets = jax.sharding.PartitionSpec(axis)
        return jax.jit(
            jax.shard_map(shard_body, mesh=mesh,
                          in_specs=(p_packets,
                                    jax.sharding.PartitionSpec()),
                          out_specs=(p_packets, p_packets, p_packets),
                          check_vma=False),
            donate_argnums=(0,))

    fn = _pool_loop_cached(cache_key, build)

    out_state, out_ids, its = fn(pool, key)
    # shard s's local id l is original packet s*per_shard + l when
    # l < per_shard (locally-padded positions are invalid)
    ids_np = np.asarray(out_ids).reshape(n_shards, n_pad_local)
    offsets = np.arange(n_shards, dtype=ids_np.dtype)[:, None] * per_shard
    local_valid = (ids_np >= 0) & (ids_np < per_shard)
    ids_np = np.where(local_valid, ids_np + offsets, -1).ravel()
    valid = (ids_np >= 0) & (ids_np < n)
    idx = ids_np[valid]
    np_dtype = np.asarray(state0.x[:1]).dtype
    final_np = {}
    for f in fields:
        col = np.zeros(n, np_dtype)
        col[idx] = np.asarray(getattr(out_state, f))[valid]
        final_np[f] = col
    return PacketState(**final_np), int(np.asarray(its).max())


def _addressable_slice(leaf, lo, hi):
    """Host copy of ``leaf[lo:hi]`` assembled from locally addressable
    data — works for numpy/host arrays, fully addressable jax arrays, and
    multi-process GSPMD arrays whose local shards cover the range."""
    n_leaf = leaf.shape[0]
    hi_data = min(hi, n_leaf)
    if hasattr(leaf, 'is_fully_addressable') and not leaf.is_fully_addressable:
        pieces = []
        need = lo
        for s in sorted(leaf.addressable_shards,
                        key=lambda sh: sh.index[0].start or 0):
            start = s.index[0].start or 0
            stop = s.index[0].stop
            stop = n_leaf if stop is None else stop
            if stop <= need or start >= hi_data:
                continue
            if start > need:
                break                      # gap: range not covered locally
            data = np.asarray(s.data)
            b = min(hi_data, stop)
            pieces.append(data[need - start:b - start])
            need = b
            if need >= hi_data:
                break
        if need < hi_data:
            raise ValueError(
                'adaptive_pool_loop_sharded (multi-process): this process '
                f'does not hold packets [{lo}, {hi_data}) locally. Shard '
                'the state over the mesh packet axis (parallel.mesh.'
                'shard_state / distributed.shard_host_local_state) or pass '
                'host-replicated arrays.')
        out = pieces[0] if len(pieces) == 1 else np.concatenate(pieces)
    else:
        out = np.asarray(leaf[lo:hi_data])
    if hi > hi_data:                       # zero-fill past the global end
        out = np.concatenate(
            [out, np.zeros(hi - hi_data, out.dtype)])
    return out


def _pool_loop_multiprocess(state0: PacketState, spec: EngineSpec,
                            forces: ForceTable,
                            surface: Optional[SurfaceTable],
                            resolution, outeredge, radius_km, key, mesh,
                            axis: str = 'packets',
                            batch: int = 1 << 20, swap_every: int = 64,
                            refill_fraction: float = 0.0625,
                            initial_step: float = 1000.0,
                            max_total_iterations: int = 10 ** 7,
                            inner_steps: int = 1, sort_group: int = 1):
    """Multi-HOST production pool loops: one independent local run per
    process over the packet-axis shards it owns, joined host-side.

    Per-shard pools have zero collectives by design, so nothing needs the
    cross-process device runtime mid-run: each process extracts its own
    contiguous block of packets (from a GSPMD-sharded state's local
    shards, or by slicing a host-replicated state), runs the standard
    single-process machinery over its local devices (with the GLOBAL
    shard index folding the RNG, so shard s draws the same stream no
    matter which process runs it), and the final states meet in ONE
    host-side allgather.  This is the Condor fan-out role
    (``/root/reference/nexoclom/utilities/Condor.py:21-105``) for the
    one-simulation case, and the zero-DCN layout for a pod.

    Deterministic physics is bit-exact vs the single-process sharded run
    and the monolithic driver (distributed selftest).  Requirements: the
    mesh's non-packet axes must be trivial, every process must own the
    same number of packet-axis shards (homogeneous pod), and each
    shard's devices must live in one process.
    """
    fields = PacketState._fields
    n = state0.x.shape[0]
    n_shards = int(mesh.shape[axis])
    me = jax.process_index()

    devs = np.asarray(mesh.devices)
    if devs.size != n_shards:
        raise ValueError(
            'multi-process pool loops need a mesh whose non-packet axes '
            f'are trivial; got shape {dict(mesh.shape)}')
    k_ax = mesh.axis_names.index(axis)
    devs = np.moveaxis(devs, k_ax, 0).reshape(n_shards)
    owners = np.array([d.process_index for d in devs])
    mine = np.nonzero(owners == me)[0]
    if mine.size == 0:
        raise ValueError(
            f'process {me} owns no devices on the mesh packet axis')
    if np.any(np.diff(mine) != 1):
        raise ValueError(
            'multi-process pool loops need each process\'s packet-axis '
            f'shards contiguous; process {me} owns {mine.tolist()}')
    counts = np.bincount(owners)
    counts = counts[counts > 0]
    if np.any(counts != counts[0]):
        raise ValueError(
            'multi-process pool loops need the same shard count per '
            f'process (host-side allgather); got {counts.tolist()}')

    per_shard = -(-n // n_shards)
    lo = int(mine[0]) * per_shard
    hi = (int(mine[-1]) + 1) * per_shard
    local = PacketState(**{
        f: _addressable_slice(getattr(state0, f), lo, hi) for f in fields})

    local_devs = list(devs[mine])
    if mine.size == 1:
        final_l, iters_l = adaptive_pool_loop(
            jax.tree.map(jnp.asarray, local), spec, forces, surface,
            resolution, outeredge, radius_km,
            jax.random.fold_in(key, int(mine[0])), batch=batch,
            swap_every=swap_every, refill_fraction=refill_fraction,
            initial_step=initial_step,
            max_total_iterations=max_total_iterations,
            inner_steps=inner_steps, sort_group=sort_group)
    else:
        local_mesh = jax.sharding.Mesh(np.array(local_devs), (axis,))
        final_l, iters_l = adaptive_pool_loop_sharded(
            jax.tree.map(jnp.asarray, local), spec, forces, surface,
            resolution, outeredge, radius_km, key, local_mesh, axis=axis,
            batch=batch, swap_every=swap_every,
            refill_fraction=refill_fraction, initial_step=initial_step,
            max_total_iterations=max_total_iterations,
            inner_steps=inner_steps, sort_group=sort_group,
            shard_offset=int(mine[0]))

    # ONE host-side join: every process contributes its block + iteration
    # count; afterwards every process holds the full final state
    from jax.experimental import multihost_utils
    payload = {f: np.asarray(getattr(final_l, f)) for f in fields}
    payload['_iters'] = np.asarray(int(iters_l), np.int64)
    gathered = multihost_utils.process_allgather(payload)

    # process p's block covers shards owned by p (contiguous, equal
    # count); allgather stacks by process index 0..P-1
    np_dtype = np.asarray(local.x[:1]).dtype
    final_np = {f: np.zeros(n, np_dtype) for f in fields}
    for p in range(int(jax.process_count())):
        sh = np.nonzero(owners == p)[0]
        if sh.size == 0:
            continue
        p_lo = int(sh[0]) * per_shard
        p_hi = min((int(sh[-1]) + 1) * per_shard, n)
        for f in fields:
            final_np[f][p_lo:p_hi] = gathered[f][p][:p_hi - p_lo]
    iterations = int(np.asarray(gathered['_iters']).max())
    return PacketState(**final_np), iterations


# Production pool-loop configuration (measured, docs/scaling.md): the
# while-loop width where the adaptive driver peaks, the pool size below
# which swap overhead outweighs the occupancy win over plain chunking,
# and the pool cap above which sequential pool-loops keep the pool +
# output carry (72 B/packet) comfortably inside v5e's 16 GB HBM.
POOL_LOOP_BATCH = 1 << 20
POOL_LOOP_MIN = 4 * POOL_LOOP_BATCH
POOL_LOOP_CHUNK = 1 << 25


def adaptive_production_run(state0: PacketState, spec: EngineSpec,
                            forces: ForceTable,
                            surface: Optional[SurfaceTable],
                            resolution, outeredge, radius_km, key,
                            orchestrator: str = 'auto',
                            inner_steps: int = 4,
                            batch: int = POOL_LOOP_BATCH,
                            swap_every: int = 64,
                            refill_fraction: float = 0.0625,
                            pool_min: int = POOL_LOOP_MIN,
                            pool_chunk: int = POOL_LOOP_CHUNK,
                            sort_group: int = 1,
                            mesh=None, shard_axis: str = 'packets'):
    """Route an adaptive batch to its best measured orchestration.

    ``orchestrator``:

    * ``'chunked'`` — :func:`adaptive_step_driver_chunked` (sequential
      monolithic sub-batches inside the validated lane envelope).
    * ``'pool'`` — :func:`adaptive_pool_loop` (device-resident pool with
      the refill inside the while loop: ONE dispatch, lane occupancy
      riding in [1 - refill_fraction, 1] vs the monolithic run-average
      36% — measured 2.75e8 accepted ps/s = 1.38x the same-session
      monolithic rate at the default 64:0.0625 config on a 16M pool,
      docs/scaling.md).
      Pools above ``pool_chunk`` run as sequential pool-loops so the
      pool + output carry stays bounded in HBM.
    * ``'auto'`` — ``'pool'`` when the batch is large enough to amortise
      the swap sorts (``n >= pool_min``), else ``'chunked'``.

    With a ``mesh`` whose ``shard_axis`` has more than one device, the
    pool path becomes :func:`adaptive_pool_loop_sharded` — one
    independent pool loop per chip, zero collectives — and the
    ``auto``/``pool_chunk`` thresholds scale by the shard count (each
    shard must amortise its own swaps; HBM is per chip).  Multi-process
    meshes decompose further into one local run per process joined by a
    single host-side allgather (:func:`_pool_loop_multiprocess` — zero
    cross-process device collectives).

    Physics is identical either way (bit-exact for deterministic specs,
    tested); with surface bounce the RNG *streams* differ between
    orchestrations — both are valid samples, the standing caveat of
    every segmented orchestrator.  Returns ``(final_state,
    iterations)``; the pool path returns a host-side numpy PacketState
    in original packet order, the chunked path device arrays.
    """
    if orchestrator not in ('auto', 'chunked', 'pool'):
        raise ValueError(f'unknown adaptive orchestrator {orchestrator!r}')
    n = state0.x.shape[0]
    n_shards = int(mesh.shape[shard_axis]) if mesh is not None else 1
    if orchestrator == 'auto':
        # multi-process meshes decompose into per-process local pool
        # loops joined host-side (_pool_loop_multiprocess) — same
        # threshold per shard
        orchestrator = ('pool' if n >= pool_min * n_shards
                        else 'chunked')
    if orchestrator == 'chunked':
        return adaptive_step_driver_chunked(
            state0, spec, forces, surface, resolution, outeredge,
            radius_km, key, inner_steps=inner_steps)

    def pool_run(sub, sub_key):
        if n_shards > 1:
            return adaptive_pool_loop_sharded(
                sub, spec, forces, surface, resolution, outeredge,
                radius_km, sub_key, mesh, axis=shard_axis, batch=batch,
                swap_every=swap_every, refill_fraction=refill_fraction,
                inner_steps=inner_steps, sort_group=sort_group)
        return adaptive_pool_loop(
            sub, spec, forces, surface, resolution, outeredge,
            radius_km, sub_key, batch=batch, swap_every=swap_every,
            refill_fraction=refill_fraction, inner_steps=inner_steps,
            sort_group=sort_group)

    pool_chunk = pool_chunk * n_shards
    if n <= pool_chunk:
        return pool_run(state0, key)
    finals = []
    iterations = 0
    for i, start in enumerate(range(0, n, pool_chunk)):
        sub = jax.tree.map(lambda leaf: leaf[start:start + pool_chunk],
                           state0)
        fin, iters = pool_run(sub, jax.random.fold_in(key, i))
        finals.append(fin)
        iterations = max(iterations, int(iters))
    final = PacketState(**{
        f: np.concatenate([np.asarray(getattr(fin, f)) for fin in finals])
        for f in PacketState._fields})
    return final, iterations


def packet_state_from_dict(x0: dict) -> PacketState:
    """Assemble the engine state from the initial-state column dict."""
    return PacketState(t=x0['time'], x=x0['x'], y=x0['y'], z=x0['z'],
                       vx=x0['vx'], vy=x0['vy'], vz=x0['vz'],
                       frac=x0['frac'],
                       lossfrac=jnp.zeros_like(x0['frac']))
