"""KS tests of the on-device source samplers against analytic CDFs
(mirrors the reference's ``test_spatial_distribution.py`` strategy)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from nexoclom_tpu.atomicdata import atomicmass
from nexoclom_tpu.constants import thermal_speed_kms
from nexoclom_tpu.ops import samplers

pytestmark = pytest.mark.initial_state

N = 100_000
KEY = jax.random.PRNGKey(20260816)


def test_uniform_lonlat_ks():
    lon, lat = samplers.sample_uniform_lonlat(
        KEY, N, (0.0, 2 * math.pi), (-math.pi / 2, math.pi / 2),
        dtype=jnp.float64)
    _, p_lon = stats.kstest(np.asarray(lon), 'uniform',
                            args=(0, 2 * math.pi))
    _, p_sinlat = stats.kstest(np.sin(np.asarray(lat)), 'uniform',
                               args=(-1, 2))
    assert p_lon > 0.01 and p_sinlat > 0.01


def test_uniform_lonlat_wrapped_range():
    # lon range crossing 0 (e.g. dawn hemisphere 3pi/2 -> pi/2)
    lon, _ = samplers.sample_uniform_lonlat(
        KEY, N, (3 * math.pi / 2, math.pi / 2), (-0.1, 0.1),
        dtype=jnp.float64)
    lon = np.asarray(lon)
    assert np.all((lon >= 3 * math.pi / 2) | (lon <= math.pi / 2))
    # uniform on the wrapped interval
    shifted = (lon - 3 * math.pi / 2) % (2 * math.pi)
    _, p = stats.kstest(shifted, 'uniform', args=(0, math.pi))
    assert p > 0.01


def test_restricted_latitude_band():
    lon, lat = samplers.sample_uniform_lonlat(
        KEY, N, (0.0, 2 * math.pi), (0.2, 0.9), dtype=jnp.float64)
    lat = np.asarray(lat)
    assert lat.min() >= 0.2 - 1e-9 and lat.max() <= 0.9 + 1e-9
    s0, s1 = math.sin(0.2), math.sin(0.9)
    _, p = stats.kstest(np.sin(lat), 'uniform', args=(s0, s1 - s0))
    assert p > 0.01


def test_isotropic_angles_ks():
    alt, az = samplers.sample_isotropic_angles(
        KEY, N, (0.0, math.pi / 2), (0.0, 2 * math.pi), dtype=jnp.float64)
    _, p_alt = stats.kstest(np.sin(np.asarray(alt)), 'uniform')
    _, p_az = stats.kstest(np.asarray(az), 'uniform', args=(0, 2 * math.pi))
    assert p_alt > 0.01 and p_az > 0.01


def test_maxwellian_speed_ks():
    vth = thermal_speed_kms(1200.0, atomicmass('Na'))
    grid = np.linspace(0.1, 5 * vth, 5000)
    f_v = grid ** 3 * np.exp(-grid ** 2 / vth ** 2)
    v = samplers.sample_tabulated_1d(KEY, jnp.asarray(f_v), grid[0], grid[-1],
                                     N, dtype=jnp.float64)

    # analytic CDF of v^3 exp(-v^2/vth^2) on [0, inf): 1-(1+x2)exp(-x2),
    # x2 = (v/vth)^2; normalise over the truncated grid support
    def cdf(vv):
        def raw(u):
            x2 = (u / vth) ** 2
            return 1 - (1 + x2) * np.exp(-x2)
        return (raw(vv) - raw(grid[0])) / (raw(grid[-1]) - raw(grid[0]))

    _, p = stats.kstest(np.asarray(v), cdf)
    assert p > 0.01


def test_flat_speed_bounds():
    v = samplers.sample_flat_speed(KEY, N, 4.0, 4.0, dtype=jnp.float64)
    v = np.asarray(v)
    assert v.min() >= 0.0 and v.max() <= 8.0
    _, p = stats.kstest(v, 'uniform', args=(0, 8))
    assert p > 0.01


def test_gaussian_speed():
    v = samplers.sample_gaussian_speed(KEY, N, 2.0, 0.5, dtype=jnp.float64)
    _, p = stats.kstest(np.asarray(v), 'norm', args=(2.0, 0.5))
    assert p > 0.01
    v0 = samplers.sample_gaussian_speed(KEY, 10, 2.0, 0.0, dtype=jnp.float64)
    assert np.all(np.asarray(v0) == 2.0)


def test_spot_distribution_concentrates():
    lon0, lat0, sigma = 3 * math.pi / 2, 0.0, math.radians(25)
    pdf, lon_grid, lat_grid = samplers.spot_pdf_grid(lon0, lat0, sigma)
    tables = samplers.build_2d_sampler_tables(pdf, lon_grid, lat_grid)
    lon, lat = samplers.sample_2d(KEY, tables, N, dtype=jnp.float64)
    lon, lat = np.asarray(lon), np.asarray(lat)

    # angular distance from the spot centre
    spot = np.array([np.sin(lon0), -np.cos(lon0), 0.0])
    pts = np.array([np.sin(lon) * np.cos(lat),
                    -np.cos(lon) * np.cos(lat),
                    np.sin(lat)])
    phi = np.arccos(np.clip(spot @ pts, -1, 1))
    # median angular distance should be ~ that of the gridded pdf
    marg = (pdf / pdf.sum())
    longrid, latgrid = np.meshgrid(lon_grid, lat_grid, indexing='ij')
    gridpts = np.array([np.sin(longrid) * np.cos(latgrid),
                        -np.cos(longrid) * np.cos(latgrid),
                        np.sin(latgrid)])
    phigrid = np.arccos(np.clip(np.tensordot(spot, gridpts, axes=1), -1, 1))
    expected_mean = (marg * phigrid).sum()
    assert abs(phi.mean() - expected_mean) < 0.02
    # lat marginal symmetric about the (equatorial) spot
    assert abs(np.mean(lat)) < 0.02


def test_spot_marginal_ks():
    # KS of the sampled longitude marginal against the gridded pdf's marginal
    lon0, lat0, sigma = 0.0, 0.0, math.radians(50)
    pdf, lon_grid, lat_grid = samplers.spot_pdf_grid(lon0, lat0, sigma)
    tables = samplers.build_2d_sampler_tables(pdf, lon_grid, lat_grid)
    lon, lat = samplers.sample_2d(KEY, tables, N, dtype=jnp.float64)

    marg = pdf.sum(axis=1)
    c = np.cumsum(marg)
    cdf_vals = (c - c[0]) / (c[-1] - c[0])
    cdf = lambda x: np.interp(x, lon_grid, cdf_vals)
    _, p = stats.kstest(np.asarray(lon), cdf)
    assert p > 0.01


def test_xyz_from_lonlat_conventions():
    # subsolar point (lon=0) -> (0,-1,0); dusk (pi/2) -> (1,0,0);
    # north pole -> (0,0,1)   (source_distribution.py:12-20)
    lon = jnp.array([0.0, math.pi / 2, 3 * math.pi / 2, 0.0])
    lat = jnp.array([0.0, 0.0, 0.0, math.pi / 2])
    x, y, z = samplers.xyz_from_lonlat(lon, lat, 1.0)
    pts = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], axis=1)
    expected = np.array([[0, -1, 0], [1, 0, 0], [-1, 0, 0], [0, 0, 1]])
    assert np.allclose(pts, expected, atol=1e-12)


def test_velocity_from_angles_radial():
    lon, lat = samplers.sample_uniform_lonlat(
        KEY, 1000, (0.0, 2 * math.pi), (-math.pi / 2, math.pi / 2),
        dtype=jnp.float64)
    x, y, z = samplers.xyz_from_lonlat(lon, lat, 1.0)
    alt = jnp.full((1000,), math.pi / 2)
    az = jnp.zeros(1000)
    speed = jnp.full((1000,), 2.0)
    vx, vy, vz = samplers.velocity_from_angles(alt, az, speed, x, y, z)
    v = np.stack([np.asarray(vx), np.asarray(vy), np.asarray(vz)], axis=1)
    r = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], axis=1)
    # purely radial with |v| = speed
    assert np.allclose(np.linalg.norm(v, axis=1), 2.0, rtol=1e-10)
    cos = np.sum(v * r, axis=1) / (2.0 * np.linalg.norm(r, axis=1))
    assert np.allclose(cos, 1.0, atol=1e-10)


def test_velocity_from_angles_unit_norm():
    lon, lat = samplers.sample_uniform_lonlat(
        KEY, 1000, (0.0, 2 * math.pi), (-1.2, 1.2), dtype=jnp.float64)
    x, y, z = samplers.xyz_from_lonlat(lon, lat, 1.0)
    alt, az = samplers.sample_isotropic_angles(
        KEY, 1000, (0.0, math.pi / 2), (0.0, 2 * math.pi), dtype=jnp.float64)
    speed = jnp.ones(1000)
    vx, vy, vz = samplers.velocity_from_angles(alt, az, speed, x, y, z)
    norm = np.sqrt(np.asarray(vx) ** 2 + np.asarray(vy) ** 2 +
                   np.asarray(vz) ** 2)
    assert np.allclose(norm, 1.0, rtol=1e-10)
    # outward-bound (positive radial component for alt in [0, pi/2])
    vdotr = (np.asarray(vx) * np.asarray(x) + np.asarray(vy) * np.asarray(y) +
             np.asarray(vz) * np.asarray(z))
    assert np.all(vdotr > -1e-10)


def test_sputtering_speed_ks():
    """Device sputtering sampler vs the analytic Sigmund-Thompson CDF."""
    from nexoclom_tpu.mathutils.distributions import sputdist
    grid = np.linspace(0.1, 50, 5000)
    f_v = sputdist(grid, 2.0, 3.0, 0.0, 'Na')
    v = samplers.sample_tabulated_1d(KEY, jnp.asarray(f_v), grid[0], grid[-1],
                                     N, dtype=jnp.float64)
    c = np.cumsum(f_v)
    c = (c - c[0]) / (c[-1] - c[0])
    _, p = stats.kstest(np.asarray(v), lambda x: np.interp(x, grid, c))
    assert p > 0.01


def test_device_sampler_matches_host_sampler():
    """The jax inverse-CDF sampler and the host numpy one draw from the same
    law (two-sample KS)."""
    from nexoclom_tpu.mathutils.randomdeviates import random_deviates_1d
    grid = np.linspace(0.0, 5.0, 1000)
    f = grid ** 2 * np.exp(-grid)
    dev = np.asarray(samplers.sample_tabulated_1d(
        KEY, jnp.asarray(f), grid[0], grid[-1], 50000, dtype=jnp.float64))
    host = random_deviates_1d(grid, f, 50000,
                              rng=np.random.default_rng(4))
    _, p = stats.ks_2samp(dev, host)
    assert p > 0.01


def test_2d_inverse_cdf_matches_rejection_sampling():
    """A1 (QUIRKS.md): the inverse-CDF 2-D sampler draws from the same law as
    the reference's acceptance-rejection method (two-sample KS on both
    marginals over the same gridded spot pdf)."""
    lon0, sigma = math.pi / 2, math.radians(30)
    pdf, lon_grid, lat_grid = samplers.spot_pdf_grid(lon0, 0.0, sigma)

    tables = samplers.build_2d_sampler_tables(pdf, lon_grid, lat_grid)
    lon_inv, lat_inv = samplers.sample_2d(KEY, tables, 50000,
                                          dtype=jnp.float64)

    # reference-style rejection sampling against the bilinear interpolant
    from scipy.interpolate import RegularGridInterpolator
    rng = np.random.default_rng(6)
    interp = RegularGridInterpolator((lon_grid, lat_grid), pdf)
    fmax = pdf.max()
    lon_rej, lat_rej = [], []
    while len(lon_rej) < 50000:
        ux = rng.uniform(lon_grid[0], lon_grid[-1], 50000)
        uy = rng.uniform(lat_grid[0], lat_grid[-1], 50000)
        uf = rng.uniform(0, fmax, 50000)
        ok = uf < interp(np.stack([ux, uy], 1))
        lon_rej.extend(ux[ok])
        lat_rej.extend(uy[ok])
    lon_rej = np.array(lon_rej[:50000])
    lat_rej = np.array(lat_rej[:50000])

    _, p_lon = stats.ks_2samp(np.asarray(lon_inv), lon_rej)
    _, p_lat = stats.ks_2samp(np.asarray(lat_inv), lat_rej)
    assert p_lon > 0.001 and p_lat > 0.001
