"""Host-side math helper tests, including KS tests of the numpy samplers."""
import numpy as np
import pytest
from scipy import stats

from nexoclom_tpu.mathutils import (Histogram, Histogram2d, MaxwellianDist,
                                    minmaxmean, random_deviates_1d,
                                    random_deviates_2d, rotation_matrix,
                                    smooth, smooth2d, sputdist)
from nexoclom_tpu.mathutils.randomdeviates import cdf_from_pdf

pytestmark = pytest.mark.mathutils


def test_histogram_bin_centers():
    h = Histogram([0.5, 1.5, 2.5], bins=3, range=[0, 3])
    assert np.allclose(h.x, [0.5, 1.5, 2.5])
    assert np.allclose(h.histogram, [1, 1, 1])


def test_histogram2d_axes():
    h = Histogram2d([0.5, 1.5], [0.5, 0.5], bins=2, range=[[0, 2], [0, 1]])
    assert np.allclose(h.x, [0.5, 1.5])
    assert np.allclose(h.y, [0.25, 0.75])
    assert h.histogram.sum() == 2


def test_rotation_matrix_z_quarter_turn():
    M = rotation_matrix(np.pi / 2, [0, 0, 1])
    # reference (row-vector) convention: v_new = M @ v rotates x -> -y
    v = M @ np.array([1.0, 0, 0])
    assert np.allclose(v, [0, -1, 0], atol=1e-12)
    # orthonormality
    assert np.allclose(M @ M.T, np.eye(3), atol=1e-12)


def test_maxwellian_shape():
    v = np.linspace(0.01, 5, 500)
    f = MaxwellianDist(v, 1200.0, 'Na')
    assert f.max() == 1.0
    # peak at v = sqrt(3/2) v_th for v^3 exp(-v^2/vth^2)
    from nexoclom_tpu.constants import thermal_speed_kms
    from nexoclom_tpu.atomicdata import atomicmass
    vth = thermal_speed_kms(1200.0, atomicmass('Na'))
    vpeak = v[np.argmax(f)]
    assert abs(vpeak - np.sqrt(1.5) * vth) < 0.05


def test_sputdist_shape():
    v = np.linspace(0.1, 50, 5000)
    f = sputdist(v, 2.0, 3.0, 0.0, 'Na')
    assert f.max() == 1.0
    assert f[0] < 1.0 and f[-1] < 0.1


def test_random_deviates_1d_gaussian_ks():
    rng = np.random.default_rng(12345)
    x = np.linspace(-5, 5, 2001)
    pdf = np.exp(-x ** 2 / 2)
    samples = random_deviates_1d(x, pdf, 100000, rng=rng)
    _, pvalue = stats.kstest(samples, 'norm')
    assert pvalue > 0.01


def test_random_deviates_2d_separable_ks():
    rng = np.random.default_rng(999)
    x = np.linspace(0, 2 * np.pi, 361)
    y = np.linspace(-1, 1, 181)
    pdf = np.outer(np.ones_like(x), 1 + 0.5 * y)  # uniform in x, linear in y
    xs, ys = random_deviates_2d(pdf, x, y, 100000, rng=rng)
    _, px = stats.kstest(xs, 'uniform', args=(0, 2 * np.pi))
    assert px > 0.01
    # analytic CDF of f(y) = (1 + 0.5 y)/2 on [-1, 1]: F = (y+1)/2 + (y^2-1)/8
    cdf = lambda y_: (y_ + 1) / 2 + (y_ ** 2 - 1) / 8
    _, py = stats.kstest(ys, cdf)
    assert py > 0.01


def test_cdf_from_pdf_monotone():
    c = cdf_from_pdf(np.array([1.0, 2.0, 3.0]))
    assert c[0] == 0 and c[-1] == 1
    assert np.all(np.diff(c) > 0)


def test_smooth_mean_wrap():
    arr = np.array([1.0, 2.0, 3.0, 4.0])
    out = smooth(arr, num=3, method='mean', wrap=True)
    assert np.isclose(out[0], np.mean([4, 1, 2]))


def test_smooth2d_preserves_mean():
    arr = np.random.default_rng(0).random((16, 16))
    out = smooth2d(arr, num=2)
    assert abs(out.mean() - arr.mean()) < 0.05


def test_minmaxmean():
    lo, hi, mean = minmaxmean(np.array([1.0, np.nan, 3.0]))
    assert (lo, hi, mean) == (1.0, 3.0, 2.0)


def test_device_histograms_match_numpy():
    """ops.histograms scatter-adds must match np.histogram semantics
    including right-edge inclusion and out-of-range drops."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import histogram1d, histogram2d
    rng = np.random.default_rng(2)
    vals = np.concatenate([rng.uniform(-1, 11, 5000), [0.0, 10.0, -5.0, 15.0]])
    w = rng.random(len(vals))
    got = np.asarray(histogram1d(jnp.asarray(vals), jnp.asarray(w),
                                 0.0, 10.0, 20))
    want, _ = np.histogram(vals, bins=20, range=(0, 10), weights=w)
    assert np.allclose(got, want, rtol=1e-12)

    ys = np.concatenate([rng.uniform(-1, 6, 5000), [5.0, 0.0, 2.0, 2.0]])
    got2 = np.asarray(histogram2d(jnp.asarray(vals), jnp.asarray(ys),
                                  jnp.asarray(w), 0.0, 10.0, 10, 0.0, 5.0, 8))
    want2, _, _ = np.histogram2d(vals, ys, bins=(10, 8),
                                 range=[[0, 10], [0, 5]], weights=w)
    assert np.allclose(got2, want2, rtol=1e-12)


def test_histogram2d_matmul_matches_scatter():
    """The exact one-hot matmul histogram equals the scatter-add form
    (same bins, out-of-range drops, right-edge inclusion)."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import histogram2d
    rng = np.random.default_rng(11)
    n = 5000
    xs = rng.uniform(-1.5, 1.5, n)
    ys = rng.uniform(-1.5, 1.5, n)
    xs[0], ys[0] = 1.0, 1.0            # right edge -> last bin
    w = rng.uniform(0.0, 2.0, n)
    args = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(w),
            -1.0, 1.0, 13, -1.0, 1.0, 7)
    scat = np.asarray(histogram2d(*args, impl='scatter'))
    mm = np.asarray(histogram2d(*args, impl='matmul'))
    np.testing.assert_allclose(mm, scat, rtol=1e-12, atol=1e-12)
    want, _, _ = np.histogram2d(xs, ys, bins=(13, 7),
                                range=[[-1, 1], [-1, 1]], weights=w)
    np.testing.assert_allclose(mm, want, rtol=1e-9)


def test_histogram2d_matmul_blocked():
    """Blocked accumulation (n > block) gives the same result."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import _histogram2d_matmul, histogram2d
    rng = np.random.default_rng(12)
    n = 700   # not a multiple of the 256 block below
    xs, ys = rng.uniform(0, 1, (2, n))
    w = rng.uniform(0.5, 1.0, n)
    ref = np.asarray(histogram2d(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(w), 0.0, 1.0, 5, 0.0, 1.0, 4,
                                 impl='scatter'))
    ix = np.clip((xs * 5).astype(np.int32), 0, 4)
    iy = np.clip((ys * 4).astype(np.int32), 0, 3)
    got = np.asarray(_histogram2d_matmul(jnp.asarray(ix), jnp.asarray(iy),
                                         jnp.asarray(w), 5, 4, block=256))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_histogram2d_pallas_interpret_matches_bf16_scatter():
    """The pallas one-hot MXU kernel (interpret mode on CPU; a measured
    perf no-go on axon, kept as an opt-in — docs/scaling.md round-4
    histogram attack) bins exactly like scatter with bf16-rounded
    weights: one-hots are exact 0/1, padding rows are inert (ix=-1),
    non-multiple-of-block N and non-tile-aligned (nx, ny) handled."""
    import jax.numpy as jnp
    from nexoclom_tpu.ops.histograms import histogram2d
    rng = np.random.default_rng(13)
    n = 2500   # not a multiple of the 1024 block; pads 2 rows short
    xs = rng.uniform(-1.5, 1.5, n)
    ys = rng.uniform(-1.5, 1.5, n)
    xs[0], ys[0] = 1.0, 1.0            # right edge -> last bin
    w = rng.uniform(0.0, 2.0, n)
    w_bf16 = np.asarray(jnp.asarray(w).astype(jnp.bfloat16), np.float32)
    args = (-1.0, 1.0, 13, -1.0, 1.0, 7)
    pal = np.asarray(histogram2d(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(w), *args,
                                 impl='pallas_interpret'))
    ref = np.asarray(histogram2d(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(w_bf16), *args,
                                 impl='scatter'))
    np.testing.assert_allclose(pal, ref, rtol=1e-6, atol=1e-6)
    assert pal.sum() > 0
