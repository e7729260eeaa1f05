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
  evaluated in closed form on device (``SurfaceInteraction.py:15-20``);
* surface-map sticking — declared by the reference's input grammar
  (``input_classes.py:277-296``) but asserted-out in its engine
  (``bouncepackets.py:90-91``) — WORKS here: the map is regridded host-side
  onto a uniform (lon, lat) grid and the sticking coefficient is
  bilinearly interpolated at each impact point on device, with the same
  planet-fixed -> solar-frame longitude rotation as the spatial surface
  map (``source_distribution.py:85-91``).

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


def bilinear_lookup(table, row_pos, col_pos, impl: str = 'gather',
                    block: int = 4096):
    """Bilinear interpolation on a 2-D table with fractional indices,
    clamping at the edges.

    ``impl='gather'`` indexes the four corners directly (fast on CPU);
    ``impl='dense'`` evaluates the identical interpolation gather-free as
    hat_row(N, nrow) @ table -> (N, ncol) row-interpolants on the MXU,
    then a hat-weighted column mix — XLA's general gather is a scalar loop
    on this TPU (CLAUDE.md), so four gathers per packet per step would
    dominate any bounce-enabled run."""
    nrow, ncol = table.shape
    r = jnp.clip(row_pos, 0.0, nrow - 1.0)
    c = jnp.clip(col_pos, 0.0, ncol - 1.0)
    if impl == 'gather':
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

    n = r.shape[0]
    pad = (-n) % block
    if pad:
        r = jnp.concatenate([r, jnp.zeros(pad, r.dtype)])
        c = jnp.concatenate([c, jnp.zeros(pad, c.dtype)])
    krow = jnp.arange(nrow, dtype=r.dtype)
    kcol = jnp.arange(ncol, dtype=c.dtype)

    def one_block(args):
        rb, cb = args
        hat_r = jnp.maximum(0.0, 1.0 - jnp.abs(rb[:, None] - krow[None, :]))
        rows = hat_r @ table                                   # (block, ncol)
        hat_c = jnp.maximum(0.0, 1.0 - jnp.abs(cb[:, None] - kcol[None, :]))
        return jnp.sum(rows * hat_c, axis=1)

    out = jax.lax.map(one_block, (r.reshape(-1, block),
                                  c.reshape(-1, block))).reshape(-1)
    return out[:n] if pad else out


def _bilinear_impl(spec) -> str:
    """Bilinear strategy from the engine's 1-D lookup strategy ('relu' has
    no 2-D analog — fall through to the dense hat contraction)."""
    return 'gather' if spec.lookup_impl == 'gather' else 'dense'


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


def _bounce_core(key, spec, surface, px, py, pz, vx, vy, vz, radius, gm,
                 t0=None, t1=None):
    """Bounce physics in the impacted body's rest frame — THE single
    implementation shared by the planet and moon paths (the planet calls it
    with radius 1 and absolute coordinates; the moon with co-moving-frame
    relative coordinates and its own radius/GM).

    Physics parity with ``bouncepackets.py:39-100``: quadratic backtrack
    along the velocity to the sphere ``|p| = radius``; impact speed from
    energy conservation v^2 = v_now^2 + 2 GM (1/r - 1/radius) (GM
    negative); cosine-weighted rebound in the local frame; thermal
    accommodation draws from the emission-speed table at the local surface
    temperature (``t0``/``t1`` override the Mercury-calibrated amplitude —
    used by the moon path); constant / temperature-dependent / surface-map
    sticking.

    Returns ``(sx, sy, sz, dx, dy, dz, v_new, stick)``: the surface point,
    rebound direction, re-emission speed, and sticking coefficient.
    """
    a = vx * vx + vy * vy + vz * vz
    b = 2.0 * (px * vx + py * vy + pz * vz)
    c = px * px + py * py + pz * pz - radius * radius
    a_safe = jnp.maximum(a, 1e-30)
    disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a_safe * c, 0.0))
    tau = jnp.minimum((-b - disc) / (2.0 * a_safe),
                      (-b + disc) / (2.0 * a_safe))
    sx = px + vx * tau
    sy = py + vy * tau
    sz = pz + vz * tau

    # impact speed from energy conservation (GM negative)
    r_now = jnp.sqrt(jnp.maximum(px * px + py * py + pz * pz, 1e-30))
    v_old2 = jnp.maximum(a + 2.0 * gm * (1.0 / r_now - 1.0 / radius), 0.0)

    k_dir, k_prob = jax.random.split(key)
    dx, dy, dz = rebound_direction(k_dir, sx, sy, sz)  # normalises inputs

    # local lon/lat of the hit (subsolar along -y for any body: the Sun is
    # far); needed by every thermal or map-based branch
    need_angles = (spec.accom or
                   spec.sticktype in ('temperature dependent', 'surface map'))
    if need_angles:
        lonhit = (jnp.arctan2(sx, -sy) + 2.0 * jnp.pi) % (2.0 * jnp.pi)
        lathit = jnp.arcsin(jnp.clip(sz / radius, -1.0, 1.0))
    if spec.accom or spec.sticktype == 'temperature dependent':
        tsurf = surface_temperature(lonhit, lathit, surface.taa,
                                    xp=jnp, **({'t0': t0, 't1': t1}
                                               if t1 is not None else {}))

    if spec.accom:
        prob = jax.random.uniform(k_prob, px.shape, dtype=px.dtype)
        row = (tsurf - surface.temp0) / surface.dtemp
        col = prob * (surface.v_table.shape[1] - 1)
        v_emit = bilinear_lookup(surface.v_table, row, col,
                                 impl=_bilinear_impl(spec))  # model units
        af = surface.accomfactor
        v_new = jnp.sqrt(af * v_emit ** 2 + (1.0 - af) * v_old2)
    else:
        v_new = jnp.sqrt(v_old2)

    if spec.sticktype == 'temperature dependent':
        stick = jnp.clip(surface.stick_A[0] *
                         jnp.exp(surface.stick_A[1] * tsurf) +
                         surface.stick_A[2], 0.0, 1.0)
    elif spec.sticktype == 'surface map':
        lon_map = lonhit
        if spec.stick_map_planet_fixed:
            # solar-fixed hit longitude -> the map's planet-fixed frame
            # (inverse of the spatial-map rotation, which is an involution:
            # source_distribution.py:85-91)
            lon_map = ((surface.map_subsolarlon - lonhit + 2.0 * jnp.pi)
                       % (2.0 * jnp.pi))
        row = (lon_map - surface.map_lon0) / surface.map_dlon
        col = (lathit - surface.map_lat0) / surface.map_dlat
        stick = jnp.clip(
            bilinear_lookup(surface.stick_map, row, col,
                            impl=_bilinear_impl(spec)), 0.0, 1.0)
    else:
        stick = surface.stickcoef

    return sx, sy, sz, dx, dy, dz, v_new, stick


def bounce_packets(key, stepped, hit, spec, surface, gm, radius_km):
    """Re-emit (or stick) packets that crossed the surface this step.

    ``stepped`` is the post-step PacketState; ``hit`` the impact mask.
    Returns the state with impacting packets moved to the surface point with
    their re-emission velocity and reduced frac.
    """
    sx, sy, sz, dx, dy, dz, v_new, stick = _bounce_core(
        key, spec, surface, stepped.x, stepped.y, stepped.z,
        stepped.vx, stepped.vy, stepped.vz, 1.0, gm)
    new_frac = stepped.frac * (1.0 - stick)

    return stepped._replace(
        x=jnp.where(hit, sx, stepped.x), y=jnp.where(hit, sy, stepped.y),
        z=jnp.where(hit, sz, stepped.z),
        vx=jnp.where(hit, dx * v_new, stepped.vx),
        vy=jnp.where(hit, dy * v_new, stepped.vy),
        vz=jnp.where(hit, dz * v_new, stepped.vz),
        frac=jnp.where(hit, new_frac, stepped.frac))


def bounce_moon_packets(key, stepped, hit, spec, surface, forces):
    """Re-emit (or stick) packets that crossed the startpoint MOON's surface.

    The planet-bounce physics of :func:`_bounce_core`
    (``bouncepackets.py:39-100`` — a path the reference never reaches for
    moons, since its engine refuses satellite sources outright,
    ``Output.py:153-155``), evaluated in the moon's co-moving frame
    (quirk F21, docs/QUIRKS.md):

    * backtrack along the velocity RELATIVE to the moving moon to the moon
      sphere ``|p_rel| = moon_radius``;
    * impact speed from energy conservation in the MOON's field,
      v_imp^2 = v_rel^2 + 2 GM_moon (1/r_rel - 1/R_moon) (GM negative);
    * cosine-weighted rebound in the moon-local frame; thermal
      accommodation draws from the same emission-speed table at the
      moon-local surface temperature with the dayside amplitude rescaled
      to the system's heliocentric distance (``surface.moon_t0/t1``, built
      in ``build_surface_table`` — the Mercury-calibrated amplitude would
      be ~2.5x too hot at Jupiter), subsolar along -y like the planet's;
    * sticking: constant or temperature dependent (surface-map sticking is
      planet-fixed, so satellite runs with a sticking map keep the map on
      the PLANET surface and use removal semantics on the moon — this
      function is never reached for them, ``engine_spec_from_inputs``
      leaves ``moon_bounce`` off);
    * the re-emitted packet inherits the moon's orbital velocity.
    """
    # moon center and orbital velocity at the post-step time (t counts down)
    from nexoclom_tpu.ops.integrator import moon_state
    mx, my, mvx, mvy = moon_state(forces, stepped.t)
    rm = forces.moon_radius

    sx, sy, sz, dx, dy, dz, v_new, stick = _bounce_core(
        key, spec, surface,
        stepped.x - mx, stepped.y - my, stepped.z,
        stepped.vx - mvx, stepped.vy - mvy, stepped.vz,
        rm, forces.moon_gm,
        t0=surface.moon_t0, t1=surface.moon_t1)
    new_frac = stepped.frac * (1.0 - stick)

    return stepped._replace(
        x=jnp.where(hit, mx + sx, stepped.x),
        y=jnp.where(hit, my + sy, stepped.y),
        z=jnp.where(hit, sz, stepped.z),
        vx=jnp.where(hit, mvx + dx * v_new, stepped.vx),
        vy=jnp.where(hit, mvy + dy * v_new, stepped.vy),
        vz=jnp.where(hit, dz * v_new, stepped.vz),
        frac=jnp.where(hit, new_frac, stepped.frac))


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------

def build_emission_speed_table(taa: float, species: str, radius_km: float,
                               nt: int = 201, nv: int = 101,
                               nprob: int = 101, extra_range=None):
    """Inverse-CDF emission-speed table over (temperature, probability).

    Same construction as ``SurfaceInteraction.py:28-61``: the temperature
    axis spans the min..max surface temperature at this TAA; for each
    temperature the speed axis spans [0, 3 v_th] and the CDF of the
    flux-weighted Maxwellian is inverted onto a uniform probability grid.

    ``extra_range``: optional (lo, hi) Kelvin interval unioned into the
    temperature span (the moon bounce uses a rescaled temperature model
    whose range may fall outside the planet's — quirk F21).

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

    t_lo, t_hi = tsurf.min(), tsurf.max()
    if extra_range is not None:
        t_lo = min(t_lo, extra_range[0])
        t_hi = max(t_hi, extra_range[1])
    temperature = np.linspace(t_lo, t_hi, nt)
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


def build_sticking_map(sourcemap):
    """Regrid a SourceMap's abundance into a uniform-grid sticking table.

    The reference's input grammar accepts ``sticktype = surface map``
    (``input_classes.py:277-296``) but its engine asserts before ever using
    the map (``bouncepackets.py:90-91``); the semantics here extend its
    temperature-dependent path: the map ``abundance`` IS the sticking
    coefficient S(lon, lat), interpolated at each impact point.

    Accepts abundance shaped (nlon, nlat) or its transpose (matching the
    spatial-map convention; SQUARE maps are ambiguous and are assumed to be
    (nlon, nlat) — store longitude-major), any monotonic grids; resamples
    bilinearly onto a uniform grid at the same resolution so the device
    lookup is O(1) fractional indexing.  Grids that stop one spacing short
    of closing the circle (bin-center axes over [0, 2pi - dlon]) get a
    periodic wrap row appended so interpolation is continuous across the
    0/2pi seam.  Returns ``(table, lon0, dlon, lat0, dlat)`` with the
    table clipped to [0, 1].
    """
    from nexoclom_tpu.utilities.exceptions import InputError
    abundance = np.asarray(sourcemap.abundance, dtype=np.float64)
    lon = np.asarray(sourcemap.longitude, dtype=np.float64)
    lat = np.asarray(sourcemap.latitude, dtype=np.float64)
    if abundance.ndim != 2 or lon.ndim != 1 or lat.ndim != 1:
        raise InputError('build_sticking_map',
                         'sticking map needs 2-D abundance with 1-D '
                         'longitude/latitude grids')
    if abundance.shape == (lat.size, lon.size) and lon.size != lat.size:
        abundance = abundance.T
    if abundance.shape != (lon.size, lat.size):
        # R5 axis convention (randomdeviates.py:58-59): values sit on
        # uniform axes of abundance.shape points spanning [min, max] — the
        # reference's real map files store bin-EDGE grids (73/37 points)
        # with bin-valued abundance (72x36)
        if (abs(abundance.shape[0] - lon.size) > 1 or
                abs(abundance.shape[1] - lat.size) > 1):
            raise InputError('build_sticking_map',
                             f'abundance shape {abundance.shape} does not '
                             f'match (nlon={lon.size}, nlat={lat.size})')
        lon = np.linspace(lon.min(), lon.max(), abundance.shape[0])
        lat = np.linspace(lat.min(), lat.max(), abundance.shape[1])
    if lon[0] > lon[-1]:
        lon, abundance = lon[::-1], abundance[::-1]
    if lat[0] > lat[-1]:
        lat, abundance = lat[::-1], abundance[:, ::-1]
    if abundance.max() > 1.0:
        # sticking maps in the wild are abundance-style data (the
        # reference's Orbit3576 sticking map spans 2.9..51); interpret as
        # relative sticking probability normalised to its maximum rather
        # than clipping everything to 1
        abundance = abundance / abundance.max()

    ulon = np.linspace(lon[0], lon[-1], lon.size)
    ulat = np.linspace(lat[0], lat[-1], lat.size)
    # separable 1-D np.interp passes = bilinear resample (exact when the
    # source grids are already uniform, the common case)
    tmp = np.empty((ulon.size, lat.size))
    for j in range(lat.size):
        tmp[:, j] = np.interp(ulon, lon, abundance[:, j])
    table = np.empty((ulon.size, ulat.size))
    for i in range(ulon.size):
        table[i] = np.interp(ulat, lat, tmp[i])
    table = np.clip(table, 0.0, 1.0)
    dlon = (ulon[-1] - ulon[0]) / max(ulon.size - 1, 1)
    dlat = (ulat[-1] - ulat[0]) / max(ulat.size - 1, 1)
    # periodic seam: a grid ending one spacing short of lon0 + 2pi wraps —
    # append row 0 at the far end so the clamped bilinear lookup
    # interpolates across 0/2pi instead of flat-clamping the last column
    if dlon > 0 and abs((ulon[-1] + dlon) - (ulon[0] + 2 * np.pi)) < 1e-9:
        table = np.concatenate([table, table[:1]], axis=0)
    return table, float(ulon[0]), float(dlon), float(ulat[0]), float(dlat)
