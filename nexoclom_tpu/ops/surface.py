"""Surface interaction: impact back-tracking, thermal re-emission, sticking.

TPU-native rewrite of ``nexoclom/particle_tracking/bouncepackets.py`` and
``SurfaceInteraction.py``:

* the bounce runs fully vectorised and masked inside the step loop (the
  reference gathers the impacting subset host-side each step);
* the Maxwellian-flux inverse-CDF emission-speed table uses the same
  (temperature x probability) grid construction (201 x 101 x 101 by default)
  but is sampled with bilinear interpolation on device instead of a host-side
  bicubic ``RectBivariateSpline`` — a sub-percent difference on this smooth
  table (docs/QUIRKS.md);
* temperature-dependent sticking S(T) = clip(A0 e^{A1 T} + A2, 0, 1) is
  evaluated in closed form on device (``SurfaceInteraction.py:15-20``).

Physics parity (``bouncepackets.py:39-100``):
  - impact point from the quadratic solve along the velocity vector;
  - impact speed from energy conservation v^2 = v_now^2 + 2 GM (1/r - 1)
    (GM negative);
  - rebound direction cosine-weighted in altitude, uniform in azimuth;
  - re-emission speed mixes the thermal draw with the elastic speed by the
    accommodation factor: v = sqrt(af v_emit^2 + (1 - af) v_old^2);
  - frac *= (1 - stick).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.initial_state.surface_temperature import surface_temperature


def _bilinear_lookup(table, row_pos, col_pos):
    """Bilinear interpolation on a 2-D table with fractional indices."""
    nrow, ncol = table.shape
    r = jnp.clip(row_pos, 0.0, nrow - 1.0)
    c = jnp.clip(col_pos, 0.0, ncol - 1.0)
    r0 = jnp.clip(jnp.floor(r).astype(jnp.int32), 0, nrow - 2)
    c0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, ncol - 2)
    wr = r - r0
    wc = c - c0
    v00 = table[r0, c0]
    v01 = table[r0, c0 + 1]
    v10 = table[r0 + 1, c0]
    v11 = table[r0 + 1, c0 + 1]
    return ((1 - wr) * (1 - wc) * v00 + (1 - wr) * wc * v01 +
            wr * (1 - wc) * v10 + wr * wc * v11)


def rebound_direction(key, x, y, z):
    """Cosine(altitude)-weighted random outward direction in the local
    (radial, east, north) frame at each surface point
    (``bouncepackets.py:5-36``)."""
    from nexoclom_tpu.ops.samplers import local_frame
    n = x.shape[0]
    k_alt, k_az = jax.random.split(key)
    sinalt = jax.random.uniform(k_alt, (n,), dtype=x.dtype)
    alt = jnp.arcsin(sinalt)
    az = 2.0 * jnp.pi * jax.random.uniform(k_az, (n,), dtype=x.dtype)

    v_rad = jnp.sin(alt)
    v_north = jnp.cos(alt) * jnp.cos(az)
    v_east = jnp.cos(alt) * jnp.sin(az)
    rad, east, north = local_frame(x, y, z)
    direction = (v_north[:, None] * north + v_east[:, None] * east +
                 v_rad[:, None] * rad)
    return direction[:, 0], direction[:, 1], direction[:, 2]


def bounce_packets(key, stepped, hit, spec, surface, gm, radius_km):
    """Re-emit (or stick) packets that crossed the surface this step.

    ``stepped`` is the post-step PacketState; ``hit`` the impact mask.
    Returns the state with impacting packets moved to the surface point with
    their re-emission velocity and reduced frac.
    """
    x, y, z = stepped.x, stepped.y, stepped.z
    vx, vy, vz = stepped.vx, stepped.vy, stepped.vz

    # surface crossing: |p + t v| = 1
    a = vx * vx + vy * vy + vz * vz
    b = 2.0 * (x * vx + y * vy + z * vz)
    c = x * x + y * y + z * z - 1.0
    a_safe = jnp.maximum(a, 1e-30)
    disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a_safe * c, 0.0))
    t0 = (-b - disc) / (2.0 * a_safe)
    t1 = (-b + disc) / (2.0 * a_safe)
    t_back = jnp.minimum(t0, t1)
    sx = x + vx * t_back
    sy = y + vy * t_back
    sz = z + vz * t_back

    # impact speed from energy conservation (GM negative)
    r_now = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    v_old2 = jnp.maximum(a + 2.0 * gm * (1.0 / r_now - 1.0), 0.0)

    k_dir, k_prob = jax.random.split(key)
    dx, dy, dz = rebound_direction(k_dir, sx, sy, sz)

    lonhit = (jnp.arctan2(sx, -sy) + 2.0 * jnp.pi) % (2.0 * jnp.pi)
    lathit = jnp.arcsin(jnp.clip(sz, -1.0, 1.0))

    if spec.accom:
        tsurf = surface_temperature(lonhit, lathit, surface.taa, xp=jnp)
        prob = jax.random.uniform(k_prob, x.shape, dtype=x.dtype)
        row = (tsurf - surface.temp0) / surface.dtemp
        col = prob * (surface.v_table.shape[1] - 1)
        v_emit = _bilinear_lookup(surface.v_table, row, col)  # model units
        af = surface.accomfactor
        v_new = jnp.sqrt(af * v_emit ** 2 + (1.0 - af) * v_old2)
    else:
        v_new = jnp.sqrt(v_old2)

    if spec.sticktype == 'temperature dependent':
        tsurf = surface_temperature(lonhit, lathit, surface.taa, xp=jnp)
        stick = jnp.clip(surface.stick_A[0] *
                         jnp.exp(surface.stick_A[1] * tsurf) +
                         surface.stick_A[2], 0.0, 1.0)
    else:
        stick = surface.stickcoef
    new_frac = stepped.frac * (1.0 - stick)

    return stepped._replace(
        x=jnp.where(hit, sx, x), y=jnp.where(hit, sy, y),
        z=jnp.where(hit, sz, z),
        vx=jnp.where(hit, dx * v_new, vx),
        vy=jnp.where(hit, dy * v_new, vy),
        vz=jnp.where(hit, dz * v_new, vz),
        frac=jnp.where(hit, new_frac, stepped.frac))


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------

def build_emission_speed_table(taa: float, species: str, radius_km: float,
                               nt: int = 201, nv: int = 101,
                               nprob: int = 101):
    """Inverse-CDF emission-speed table over (temperature, probability).

    Same construction as ``SurfaceInteraction.py:28-61``: the temperature
    axis spans the min..max surface temperature at this TAA; for each
    temperature the speed axis spans [0, 3 v_th] and the CDF of the
    flux-weighted Maxwellian is inverted onto a uniform probability grid.

    Returns ``(v_table_model_units, temp0, dtemp)`` with the speed already
    converted to R_planet/s.
    """
    from nexoclom_tpu.atomicdata import atomicmass
    from nexoclom_tpu.constants import thermal_speed_kms
    from nexoclom_tpu.mathutils.distributions import MaxwellianDist

    longitude = np.arange(361) * np.pi / 180.0
    latitude = np.arange(181) * np.pi / 180.0 - np.pi / 2.0
    longrid, latgrid = np.meshgrid(longitude, latitude)
    tsurf = surface_temperature(longrid.ravel(), latgrid.ravel(), taa)

    temperature = np.linspace(tsurf.min(), tsurf.max(), nt)
    probability = np.linspace(0.0, 1.0, nprob)
    table = np.empty((nt, nprob))
    for i, temp in enumerate(temperature):
        v_th = thermal_speed_kms(temp, atomicmass(species))
        vrange = np.linspace(0.0, 3.0 * v_th, nv)
        f_v = MaxwellianDist(vrange, temp, species)
        cum = np.cumsum(f_v)
        cum = (cum - cum.min()) / (cum.max() - cum.min())
        table[i] = np.interp(probability, cum, vrange)

    return (table / radius_km, float(temperature[0]),
            float(temperature[1] - temperature[0]))
