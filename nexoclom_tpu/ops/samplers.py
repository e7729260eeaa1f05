"""On-device source-distribution samplers.

TPU-native replacements for ``nexoclom/initial_state/source_distribution.py``
and ``nexoclom/math/randomdeviates.py``:

* every sampler is a pure function of a ``jax.random`` key with static
  shapes, so source generation jits and shards along the packet axis;
* tabulated 1-D distributions sample by inverse transform on the same
  cumsum-CDF construction the reference uses (``randomdeviates.py:30-33``);
* 2-D map/spot distributions sample marginal-then-conditional from
  precomputed per-row inverse-CDF tables (host-built, see
  :func:`build_2d_sampler_tables`) instead of the reference's
  acceptance-rejection loop, which cannot vectorise under jit.  The sampled
  law is the same gridded pdf; statistical agreement is enforced by KS tests.

Coordinate conventions (identical to the reference, see
``source_distribution.py:12-34``): model frame with the Sun along -y,
x = dusk, z = north; longitude measured from the subsolar point through dusk;
for a planet start, ``x = exo sin(lon) cos(lat), y = -exo cos(lon) cos(lat),
z = exo sin(lat)``.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * math.pi


# --------------------------------------------------------------------------
# Inverse-CDF machinery
# --------------------------------------------------------------------------

def cumdist(f: jnp.ndarray) -> jnp.ndarray:
    """Reference-style CDF from tabulated pdf values: cumsum shifted to start
    at 0 and normalised to end at 1."""
    c = jnp.cumsum(f)
    return (c - c[0]) / (c[-1] - c[0])


def sample_tabulated_1d(key, f: jnp.ndarray, x0: float, x1: float,
                        n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse-transform samples from pdf values ``f`` tabulated uniformly on
    [x0, x1]."""
    u = jax.random.uniform(key, (n,), dtype=dtype)
    grid = jnp.linspace(x0, x1, f.shape[0], dtype=dtype)
    return jnp.interp(u, cumdist(f).astype(dtype), grid)


class Sampler2DTables(NamedTuple):
    """Host-precomputed tables for marginal/conditional 2-D sampling."""
    x_cdf: np.ndarray        # (nx,) CDF of the x marginal
    x_grid: np.ndarray       # (nx,)
    y_inverse: np.ndarray    # (nx, K) inverse CDF of y conditional per x row


def build_2d_sampler_tables(pdf: np.ndarray, x_grid: np.ndarray,
                            y_grid: np.ndarray, nprob: int = 1025
                            ) -> Sampler2DTables:
    """Precompute marginal + per-row inverse-CDF tables for ``sample_2d``.

    ``pdf[i, j]`` is the relative probability at ``(x_grid[i], y_grid[j])``
    with respect to the flat measure dx dy (matching the measure the
    reference's rejection sampler draws from).
    """
    pdf = np.asarray(pdf, dtype=np.float64)
    x_grid = np.asarray(x_grid, dtype=np.float64)
    y_grid = np.asarray(y_grid, dtype=np.float64)

    marginal = pdf.sum(axis=1)
    c = np.cumsum(marginal)
    x_cdf = (c - c[0]) / (c[-1] - c[0])

    prob = np.linspace(0.0, 1.0, nprob)
    y_inverse = np.empty((pdf.shape[0], nprob))
    for i in range(pdf.shape[0]):
        row = np.cumsum(pdf[i])
        rng = row[-1] - row[0]
        if rng <= 0:
            y_inverse[i] = y_grid[0]
        else:
            y_inverse[i] = np.interp(prob, (row - row[0]) / rng, y_grid)
    return Sampler2DTables(x_cdf=x_cdf, x_grid=x_grid, y_inverse=y_inverse)


def sample_2d(key, tables: Sampler2DTables, n: int,
              dtype=jnp.float32):
    """Draw ``n`` (x, y) pairs from the tabulated 2-D pdf."""
    kx, ky = jax.random.split(key)
    ux = jax.random.uniform(kx, (n,), dtype=dtype)
    uy = jax.random.uniform(ky, (n,), dtype=dtype)

    x_cdf = jnp.asarray(tables.x_cdf, dtype=dtype)
    x_grid = jnp.asarray(tables.x_grid, dtype=dtype)
    y_inv = jnp.asarray(tables.y_inverse, dtype=dtype)

    xs = jnp.interp(ux, x_cdf, x_grid)
    rows = jnp.clip(jnp.searchsorted(x_grid, xs), 0, x_grid.shape[0] - 1)

    nprob = y_inv.shape[1]
    pos = uy * (nprob - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, nprob - 2)
    frac = pos - lo
    y_lo = y_inv[rows, lo]
    y_hi = y_inv[rows, lo + 1]
    ys = y_lo + frac * (y_hi - y_lo)
    return xs, ys


# --------------------------------------------------------------------------
# Spatial distributions
# --------------------------------------------------------------------------

def xyz_from_lonlat(lon, lat, exobase: float, is_planet: bool = True):
    """Model-frame cartesian position from longitude/latitude
    (``source_distribution.py:12-34``)."""
    sign = 1.0 if is_planet else -1.0
    x = sign * exobase * jnp.sin(lon) * jnp.cos(lat)
    y = -exobase * jnp.cos(lon) * jnp.cos(lat)
    z = exobase * jnp.sin(lat)
    return x, y, z


def sample_uniform_lonlat(key, n: int, longitude, latitude,
                          dtype=jnp.float32):
    """Uniform surface density: lon uniform over its (possibly wrapped)
    range, sin(lat) uniform (``source_distribution.py:47-62``)."""
    klat, klon = jax.random.split(key)
    s0, s1 = math.sin(latitude[0]), math.sin(latitude[1])
    sinlat = s0 + (s1 - s0) * jax.random.uniform(klat, (n,), dtype=dtype)
    lat = jnp.arcsin(sinlat)

    lon0, lon1 = longitude
    if lon0 > lon1:
        lon1 = lon1 + TWO_PI
    lon = (lon0 + (lon1 - lon0) *
           jax.random.uniform(klon, (n,), dtype=dtype)) % TWO_PI
    return lon, lat


def spot_pdf_grid(lon0: float, lat0: float, sigma: float,
                  nlon: int = 361, nlat: int = 181):
    """Surface-spot pdf exp(-phi/sigma) on a (lon, lat) grid.

    Same grid and angular-distance construction as the reference
    (``source_distribution.py:96-121``) with two documented deviations
    (docs/QUIRKS.md): the z-component sign of the grid points is corrected
    (the reference negates it, mirroring off-equator spots in latitude), and
    sampling is exact inverse-CDF instead of rejection.  The sampling measure
    is flat in (lon, lat) — matching the reference's active code path, which
    does *not* apply the sin-latitude area weight.
    """
    longitude = np.linspace(0.0, TWO_PI, nlon)
    latitude = np.linspace(-np.pi / 2, np.pi / 2, nlat)
    spot = np.array([np.sin(lon0) * np.cos(lat0),
                     -np.cos(lon0) * np.cos(lat0),
                     np.sin(lat0)])
    ptsx = np.outer(np.sin(longitude), np.cos(latitude))
    ptsy = -np.outer(np.cos(longitude), np.cos(latitude))
    ptsz = np.outer(np.ones_like(longitude), np.sin(latitude))
    cosphi = np.clip(ptsx * spot[0] + ptsy * spot[1] + ptsz * spot[2], -1, 1)
    phi = np.arccos(cosphi)
    return np.exp(-phi / sigma), longitude, latitude


# --------------------------------------------------------------------------
# Speed distributions
# --------------------------------------------------------------------------

def sample_gaussian_speed(key, n: int, vprob: float, sigma: float,
                          dtype=jnp.float32):
    """Gaussian speed (km/s); sigma == 0 degenerates to a delta at vprob."""
    if sigma == 0:
        return jnp.full((n,), vprob, dtype=dtype)
    return (jax.random.normal(key, (n,), dtype=dtype) * sigma + vprob)


def sample_flat_speed(key, n: int, vprob: float, delv: float,
                      dtype=jnp.float32):
    """Uniform speed on [vprob - delv, vprob + delv] (km/s)."""
    u = jax.random.uniform(key, (n,), dtype=dtype)
    return u * 2 * delv + vprob - delv


# --------------------------------------------------------------------------
# Angular distributions
# --------------------------------------------------------------------------

def sample_isotropic_angles(key, n: int, altitude, azimuth,
                            dtype=jnp.float32):
    """f(alt) = cos(alt) over the altitude range; azimuth uniform over its
    (possibly wrapped) range (``source_distribution.py:202-212``)."""
    kalt, kaz = jax.random.split(key)
    a0, a1 = math.sin(altitude[0]), math.sin(altitude[1])
    sinalt = a0 + (a1 - a0) * jax.random.uniform(kalt, (n,), dtype=dtype)
    alt = jnp.arcsin(sinalt)

    az0, az1 = azimuth
    if az0 > az1:
        az1 = az1 + TWO_PI
    az = az0 + (az1 - az0) * jax.random.uniform(kaz, (n,), dtype=dtype)
    return alt, az


def local_frame(x, y, z, eps: float = 1e-30):
    """Orthonormal (radial, east, north) frame at each surface point.

    The reference's frame (``source_distribution.py:236-245``) divides by a
    zero norm exactly at the poles; here the norms are floored at ``eps`` so
    pole-launched packets get a well-defined (radial-only) direction.
    """
    rad = jnp.stack([x, y, z], axis=-1)
    east = jnp.stack([y, -x, jnp.zeros_like(z)], axis=-1)
    north = jnp.stack([-z * x, -z * y, x * x + y * y], axis=-1)

    def normalize(v):
        norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                                    eps))
        return v / norm

    return normalize(rad), normalize(east), normalize(north)


def velocity_from_angles(alt, az, speed, x, y, z):
    """Rotate (altitude, azimuth) launch directions into the model frame at
    each surface point and scale by speed
    (``source_distribution.py:229-252``)."""
    v_rad = jnp.sin(alt)
    v_north = jnp.cos(alt) * jnp.cos(az)
    v_east = jnp.cos(alt) * jnp.sin(az)
    rad, east, north = local_frame(x, y, z)
    direction = (v_north[:, None] * north + v_east[:, None] * east +
                 v_rad[:, None] * rad)
    v = direction * speed[:, None]
    return v[:, 0], v[:, 1], v[:, 2]


def velocity_from_angles_2d(alt, speed, x, y):
    """Planar ('2d') angular distribution: velocities in the equatorial plane
    (``source_distribution.py:259-283``)."""
    v_rad = jnp.sin(alt)
    v_tan = jnp.cos(alt)
    norm_r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30))
    radx, rady = x / norm_r, y / norm_r
    tanx, tany = y / norm_r, -x / norm_r
    vx = (v_tan * tanx + v_rad * radx) * speed
    vy = (v_tan * tany + v_rad * rady) * speed
    return vx, vy, jnp.zeros_like(vx)
