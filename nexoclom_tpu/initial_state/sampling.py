"""Build initial packet states (X0) from an Input specification.

Orchestrates the on-device samplers in :mod:`nexoclom_tpu.ops.samplers` to
produce the same initial-state columns as the reference
(``particle_tracking/Output.py:136-182``):

    time, x, y, z, vx, vy, vz, frac, v,
    longitude, latitude, local_time, altitude, azimuth

Units: positions in R_planet, velocities in R_planet/s, time in seconds,
angles in radians (identical to the reference's model units).

Time-sampling parity (``Output.py:136-139``): constant-step runs start every
packet with the full endtime; adaptive runs draw each packet's age uniformly
in [0, endtime] — the reference's steady-state trick.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.atomicdata import atomicmass
from nexoclom_tpu.constants import thermal_speed_kms
from nexoclom_tpu.initial_state.sourcemap import SourceMap
from nexoclom_tpu.mathutils.distributions import MaxwellianDist, sputdist
from nexoclom_tpu.ops import samplers
from nexoclom_tpu.utilities.exceptions import InputError

TWO_PI = 2.0 * math.pi


def _spatial(key, inputs, n, dtype):
    spatial = inputs.spatialdist
    if spatial.type == 'uniform':
        lon, lat = samplers.sample_uniform_lonlat(
            key, n, spatial.longitude, spatial.latitude, dtype=dtype)
    elif spatial.type == 'surface spot':
        pdf, lon_grid, lat_grid = samplers.spot_pdf_grid(
            spatial.longitude, spatial.latitude, spatial.sigma)
        tables = samplers.build_2d_sampler_tables(pdf, lon_grid, lat_grid)
        lon, lat = samplers.sample_2d(key, tables, n, dtype=dtype)
    elif spatial.type == 'surface map':
        sourcemap = SourceMap(spatial.mapfile)
        if sourcemap.abundance is None:
            raise InputError('build_initial_state',
                             f'no abundance in mapfile {spatial.mapfile}')
        if sourcemap.latitude is None:
            lon = samplers.sample_tabulated_1d(
                key, jnp.asarray(sourcemap.abundance, dtype=dtype),
                float(sourcemap.longitude.min()),
                float(sourcemap.longitude.max()), n, dtype=dtype)
            lat = jnp.zeros(n, dtype=dtype)
        else:
            # R5 axis convention (randomdeviates.py:58-59): the pdf sits on
            # uniform axes spanning [min, max] with pdf.shape points,
            # regardless of the stored grid spacing or length — this is
            # also how the reference "supports" its edge-grid map files
            # (73/37-point grids with 72x36 abundance)
            abundance = np.asarray(sourcemap.abundance, dtype=np.float64)
            lon_axis = np.linspace(sourcemap.longitude.min(),
                                   sourcemap.longitude.max(),
                                   abundance.shape[0])
            sinlat = np.sin(np.asarray(sourcemap.latitude, np.float64))
            sinlat_axis = np.linspace(sinlat.min(), sinlat.max(),
                                      abundance.shape[1])
            tables = samplers.build_2d_sampler_tables(
                abundance, lon_axis, sinlat_axis)
            lon, sinlat = samplers.sample_2d(key, tables, n, dtype=dtype)
            lat = jnp.arcsin(jnp.clip(sinlat, -1.0, 1.0))
        if 'planet' in sourcemap.coordinate_system:
            if spatial.subsolarlon is None:
                raise InputError('build_initial_state',
                                 'spatialdist.subsolarlon is required for a '
                                 'planet-fixed source map')
            # rotate planet-fixed map longitudes into the solar-fixed model
            # frame (source_distribution.py:85-91; unverified in the
            # reference — see docs/QUIRKS.md)
            lon = (spatial.subsolarlon - lon + TWO_PI) % TWO_PI
    else:
        raise InputError('build_initial_state',
                         f'spatialdist.type = {spatial.type} not valid here')
    return lon, lat


def _speed_kms(key, inputs, n, dtype, lonlat=None):
    speed = inputs.speeddist
    species = inputs.options.species
    if speed.type == 'gaussian':
        return samplers.sample_gaussian_speed(key, n, speed.vprob,
                                              speed.sigma, dtype=dtype)
    elif speed.type == 'flat':
        return samplers.sample_flat_speed(key, n, speed.vprob, speed.delv,
                                          dtype=dtype)
    elif speed.type == 'maxwellian':
        if speed.temperature == 0:
            # Maxwellian at the LOCAL surface temperature of each launch
            # point — declared by the reference's grammar but asserted-out
            # (source_distribution.py:165-168, 'Need to write this').
            # Implemented via the same (temperature x probability)
            # inverse-CDF table the bounce re-emission uses, evaluated at
            # T(lon, lat, taa) per packet (quirk F15).
            if lonlat is None:
                raise InputError('build_initial_state',
                                 'maxwellian with temperature=0 needs '
                                 'surface launch points')
            from nexoclom_tpu.initial_state.sections import effective_taa
            from nexoclom_tpu.initial_state.surface_temperature import (
                surface_temperature)
            from nexoclom_tpu.ops.integrator import default_lookup_impl
            from nexoclom_tpu.ops.surface import (
                bilinear_lookup, build_emission_speed_table)
            taa = effective_taa(inputs.geometry)
            radius_km = inputs.geometry.planet.radius
            v_table, temp0, dtemp = build_emission_speed_table(
                taa, species, radius_km)
            v_table = jnp.asarray(v_table * radius_km, dtype)  # km/s
            lon, lat = lonlat
            tsurf = surface_temperature(lon, lat, jnp.asarray(taa, dtype),
                                        xp=jnp)
            prob = jax.random.uniform(key, lon.shape, dtype=dtype)
            row = (tsurf - temp0) / dtemp
            col = prob * (v_table.shape[1] - 1)
            impl = ('gather' if default_lookup_impl() == 'gather'
                    else 'dense')
            return bilinear_lookup(v_table, row, col, impl=impl)
        vth = thermal_speed_kms(speed.temperature, atomicmass(species))
        grid = np.linspace(0.1, 5 * vth, 5000)
        f_v = MaxwellianDist(grid, speed.temperature, species)
        return samplers.sample_tabulated_1d(key, jnp.asarray(f_v, dtype=dtype),
                                            float(grid[0]), float(grid[-1]),
                                            n, dtype=dtype)
    elif speed.type == 'sputtering':
        grid = np.linspace(0.1, 50, 5000)
        f_v = sputdist(grid, speed.U, speed.alpha, speed.beta, species)
        return samplers.sample_tabulated_1d(key, jnp.asarray(f_v, dtype=dtype),
                                            float(grid[0]), float(grid[-1]),
                                            n, dtype=dtype)
    elif speed.type == 'user defined':
        vdist = SourceMap(speed.vdistfile)
        if vdist.speed is None or vdist.speed_dist is None:
            raise InputError('build_initial_state',
                             f'{speed.vdistfile} has no speed distribution')
        # reference regrids the pdf onto a uniform axis over [min, max]
        # regardless of the source grid (randomdeviates.py:29)
        return samplers.sample_tabulated_1d(
            key, jnp.asarray(vdist.speed_dist, dtype=dtype),
            float(np.min(vdist.speed)), float(np.max(vdist.speed)),
            n, dtype=dtype)
    else:
        raise InputError('build_initial_state',
                         f'speeddist.type = {speed.type} not valid here')


def _sample_impl(key, inputs, n: int, dtype):
    """The traced sampling body (see build_initial_state)."""
    k_time, k_spatial, k_speed, k_angular = jax.random.split(key, 4)

    options = inputs.options
    radius_km = inputs.geometry.planet.radius

    if options.step_size != 0:
        t = jnp.full((n,), options.endtime, dtype=dtype)
    else:
        t = jax.random.uniform(k_time, (n,), dtype=dtype) * options.endtime

    geometry = inputs.geometry
    satellite = geometry.startpoint != geometry.planet.object
    lon, lat = _spatial(k_spatial, inputs, n, dtype)
    # for satellite starts these are MOON-centred coordinates in moon radii
    # (the reference's satellite x-flip convention, xyz_from_lonlat)
    x, y, z = samplers.xyz_from_lonlat(
        lon, lat, inputs.spatialdist.exobase,
        is_planet=not satellite)

    v_model = _speed_kms(k_speed, inputs, n, dtype,
                         lonlat=(lon, lat)) / radius_km

    angular = inputs.angulardist
    if angular.type == 'radial':
        alt = jnp.full((n,), math.pi / 2, dtype=dtype)
        az = jnp.zeros(n, dtype=dtype)
        vx, vy, vz = samplers.velocity_from_angles(alt, az, v_model, x, y, z)
    elif angular.type == 'isotropic':
        alt, az = samplers.sample_isotropic_angles(
            k_angular, n, angular.altitude, angular.azimuth, dtype=dtype)
        vx, vy, vz = samplers.velocity_from_angles(alt, az, v_model, x, y, z)
    elif angular.type == '2d':
        c0, c1 = math.cos(angular.altitude[0]), math.cos(angular.altitude[1])
        u = jax.random.uniform(k_angular, (n,), dtype=dtype)
        alt = jnp.arccos(u * (c1 - c0) + c0)
        az = jnp.zeros(n, dtype=dtype)
        vx, vy, vz = samplers.velocity_from_angles_2d(alt, v_model, x, y)
    else:
        raise InputError('build_initial_state',
                         f'angulardist.type = {angular.type} not defined')

    if satellite:
        # translate the moon-local launch sphere to the moon's orbital
        # position AT EACH PACKET'S LAUNCH TIME and add the orbital
        # velocity there (initial_state/satellites.py — the reference
        # asserts on this path, Output.py:153-155).  phi is the phase at
        # the observation (t = 0); a packet of age t launched when the
        # moon was at phi - omega*t — for constant-step runs every packet
        # has t = endtime, for adaptive steady-state runs ages are random
        # so launches spread along the orbital arc, as a continuous source
        # on a moving moon physically does.
        from nexoclom_tpu.initial_state.satellites import satellite_params
        from nexoclom_tpu.ops.integrator import orbit_state
        a_rp, omega, phi_obs, moon_radius, _ = satellite_params(geometry)
        cx, cy, vox, voy = orbit_state(a_rp, omega, phi_obs - omega * t)
        scale = float(moon_radius)
        x = x * scale + cx
        y = y * scale + cy
        z = z * scale
        vx = vx + vox
        vy = vy + voy

    local_time = (lon * 12 / math.pi + 12) % 24
    return {
        'time': t,
        'x': x.astype(dtype), 'y': y.astype(dtype), 'z': z.astype(dtype),
        'vx': vx.astype(dtype), 'vy': vy.astype(dtype),
        'vz': vz.astype(dtype),
        'frac': jnp.ones(n, dtype=dtype),
        'v': v_model.astype(dtype),
        'longitude': lon.astype(dtype), 'latitude': lat.astype(dtype),
        'local_time': local_time.astype(dtype),
        'altitude': alt.astype(dtype), 'azimuth': az.astype(dtype),
    }


# One compiled sampler per (canonical inputs, n, dtype): chunked mega-runs
# re-draw initial states every chunk, and on the axon platform each eager
# device op costs a ~50 ms round trip — jitting the whole assembly makes a
# chunk's source generation a single dispatch.
_SAMPLER_CACHE: dict = {}


def build_initial_state(inputs, n: int, seed=None, dtype=jnp.float64):
    """Sample ``n`` packets' initial states.  Returns a dict of jnp arrays
    with the reference's X0 columns (model units).

    Time-sampling parity (``Output.py:136-139``): constant-step runs start
    every packet with the full endtime; adaptive runs draw uniform random
    ages (the steady-state trick).
    """
    import json

    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2 ** 63))

    cache_key = (json.dumps(inputs.to_dict(), sort_keys=True, default=str),
                 int(n), str(dtype))
    sampler = _SAMPLER_CACHE.get(cache_key)
    if sampler is None:
        def sample(key):
            return _sample_impl(key, inputs, n, dtype)
        sampler = jax.jit(sample)
        if len(_SAMPLER_CACHE) > 64:
            _SAMPLER_CACHE.clear()
        _SAMPLER_CACHE[cache_key] = sampler
    return sampler(jax.random.PRNGKey(seed))
