"""Analytic unit tests of the LOS reduction kernel and geometry helpers."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from nexoclom_tpu.ops.los import los_fitted_accumulate, los_geometry, los_reduce

pytestmark = pytest.mark.data_simulation

RP_CM = 2440.53 * 1e5
DPHI = math.radians(1.0)


def _reduce(px, py, pz, w, sc, bore, obstruction=None, dd=None,
            quantity='radiance'):
    sc = np.atleast_2d(sc).astype(float)
    bore = np.atleast_2d(bore).astype(float)
    S = len(sc)
    if obstruction is None:
        obstruction = np.full(S, 1e30)
    if dd is None:
        dd = np.full(S, 1e30)
    return los_reduce(jnp.asarray(px, jnp.float64),
                      jnp.asarray(py, jnp.float64),
                      jnp.asarray(pz, jnp.float64),
                      jnp.asarray(w, jnp.float64),
                      jnp.asarray(sc), jnp.asarray(bore),
                      jnp.asarray(obstruction), jnp.asarray(dd),
                      DPHI, RP_CM, quantity=quantity)


def test_single_packet_on_boresight():
    # packet 5 R_p straight down the boresight, sunward side (no shadow)
    sc = [0.0, -10.0, 0.0]
    bore = [0.0, 1.0, 0.0]    # looking anti-sunward from y=-10
    rad, npack, used = _reduce([0.0], [-5.0], [0.0], [2.0], sc, bore)
    d = 5.0
    expected = 2.0 / (math.pi * (d * math.sin(DPHI) * RP_CM) ** 2)
    assert np.isclose(float(rad[0]), expected, rtol=1e-12)
    assert int(npack[0]) == 1
    assert bool(used[0])


def test_packet_outside_cone_excluded():
    sc = [0.0, -10.0, 0.0]
    bore = [0.0, 1.0, 0.0]
    # packet offset 0.5 R_p at distance 5 -> angle ~5.7 deg > 1 deg
    rad, npack, used = _reduce([0.5], [-5.0], [0.0], [1.0], sc, bore)
    assert float(rad[0]) == 0.0 and int(npack[0]) == 0 and not bool(used[0])


def test_shadowed_projection_dropped_for_radiance():
    # packet behind the planet (y>0, rho<1): in view but its LOS point is in
    # shadow -> radiance drops it, column keeps it
    sc = [0.0, 10.0, 0.0]
    bore = [0.0, -1.0, 0.0]    # looking sunward from behind the planet
    px, py, pz, w = [0.0], [5.0], [0.0], [1.0]
    rad, npack, used = _reduce(px, py, pz, w, sc, bore,
                               obstruction=np.array([10.0]))
    assert float(rad[0]) == 0.0      # shadowed
    assert int(npack[0]) == 1        # still counted as in view
    assert not bool(used[0])
    col, _, used_c = _reduce(px, py, pz, w, sc, bore,
                             obstruction=np.array([10.0]),
                             quantity='column')
    assert float(col[0]) > 0.0 and bool(used_c[0])


def test_planet_obstruction_cuts_los():
    # packet beyond the planet along a boresight that hits the planet
    sc = [0.0, -10.0, 0.0]
    bore = [0.0, 1.0, 0.0]     # looks straight at the planet centre
    obstruction, dd = los_geometry([sc], [bore], 1e30)
    assert obstruction[0] == 10.0     # distance to planet centre
    # packet on the near side (losrad = 3 < 10): included
    rad_near, _, _ = _reduce([0.0], [-7.0], [0.0], [1.0], sc, bore,
                             obstruction=obstruction)
    # packet on the far side (losrad = 15 > 10): blocked
    rad_far, _, _ = _reduce([0.0], [5.0], [0.0], [1.0], sc, bore,
                            obstruction=obstruction)
    assert float(rad_near[0]) > 0.0
    assert float(rad_far[0]) == 0.0


def test_los_geometry_miss_and_outer_edge():
    sc = [[0.0, -10.0, 0.0], [0.0, -10.0, 0.0]]
    bore = [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]   # hit planet; miss planet
    obstruction, dd = los_geometry(sc, bore, 20.0)
    assert obstruction[0] == 10.0
    assert obstruction[1] == 1e30
    # outer edge at 20: along +y from y=-10, exit at y=+20 -> dd=30
    assert np.isclose(dd[0], 30.0)
    # perpendicular: dd = sqrt(20^2-10^2)
    assert np.isclose(dd[1], math.sqrt(300.0))


def test_many_spectra_chunking():
    rng = np.random.default_rng(0)
    n = 500
    px = rng.normal(0, 3, n)
    py = rng.normal(-5, 3, n)
    pz = rng.normal(0, 3, n)
    w = rng.random(n)
    S = 70   # not a multiple of the 32-chunk
    sc = np.tile([0.0, -20.0, 0.0], (S, 1))
    bore = rng.normal(size=(S, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, dd = los_geometry(sc, bore, 1e30)
    rad, npack, used = los_reduce(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), jnp.asarray(w),
        jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
        jnp.asarray(dd), math.radians(20.0), RP_CM)
    # brute-force reference
    for s in range(0, S, 13):
        rel = np.stack([px, py, pz], 1) - sc[s]
        d = np.linalg.norm(rel, axis=1)
        losrad = rel @ bore[s]
        cosang = np.clip(losrad / d, -1, 1)
        inview = ((losrad < obstruction[s]) &
                  (cosang >= math.cos(math.radians(20.0))) & (losrad <= dd[s]))
        hit = sc[s][None] + bore[s][None] * losrad[:, None]
        oos = (hit[:, 0] ** 2 + hit[:, 2] ** 2 > 1) | (hit[:, 1] < 0)
        apix = math.pi * (d * math.sin(math.radians(20.0)) * RP_CM) ** 2
        expected = np.sum(np.where(inview & oos, w / apix, 0.0))
        assert np.isclose(float(rad[s]), expected, rtol=1e-10)


def test_fitted_accumulate_weighted_mean():
    # two packets, two spectra, each spectrum sees one packet
    px = np.array([0.0, 0.0])
    py = np.array([-5.0, -5.0])
    pz = np.array([0.0, 3.0])
    w = np.array([1.0, 1.0])
    x0_index = np.array([0, 1])
    sc = np.array([[0.0, -10.0, 0.0], [0.0, -10.0, 3.0]])
    bore = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    obstruction = np.full(2, 1e30)
    dd = np.full(2, 1e30)
    ratio = np.array([2.0, 0.5])
    mask = np.array([True, True])
    sigma = np.ones(2)
    rs, ss = los_fitted_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), jnp.asarray(w),
        jnp.asarray(x0_index), jnp.asarray(sc), jnp.asarray(bore),
        jnp.asarray(obstruction), jnp.asarray(dd), jnp.asarray(ratio),
        jnp.asarray(mask), jnp.asarray(sigma), DPHI, n_x0=2)
    rs, ss = np.asarray(rs), np.asarray(ss)
    assert np.allclose(ss, [1.0, 1.0])
    assert np.allclose(rs, [2.0, 0.5])
    # masked-out spectrum contributes nothing
    rs2, ss2 = los_fitted_accumulate(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), jnp.asarray(w),
        jnp.asarray(x0_index), jnp.asarray(sc), jnp.asarray(bore),
        jnp.asarray(obstruction), jnp.asarray(dd), jnp.asarray(ratio),
        jnp.asarray([True, False]), jnp.asarray(sigma), DPHI, n_x0=2)
    assert np.asarray(ss2)[1] == 0.0


def test_los_geometry_moon_occlusion():
    """A boresight through the startpoint moon's disk is cut at the exact
    near-intersection; rays that miss, or where the moon is behind the
    spacecraft, are unaffected."""
    from nexoclom_tpu.ops.los import los_geometry
    moon_center = np.array([0.0, 5.9, 0.0])
    r_m = 0.025
    sc = np.array([[0.0, 0.0, 0.0],     # looking straight at the moon
                   [0.0, 0.0, 0.0],     # looking away from it
                   [0.0, 10.0, 0.0]])   # moon behind the spacecraft
    bore = np.array([[0.0, 1.0, 0.0],
                     [0.0, -1.0, 0.0],
                     [0.0, 1.0, 0.0]])
    # offset the first two spacecraft from the origin so the planet's
    # disk is not in view
    sc[:2, 0] = 3.0
    moonc = moon_center.copy(); moonc[0] = 3.0   # keep the hit geometry
    obstruction, _ = los_geometry(sc, bore, 1e30, moons=[(moonc, r_m)])
    assert obstruction[0] == pytest.approx(5.9 - r_m)
    assert obstruction[1] == 1e30
    assert obstruction[2] == 1e30   # intersection at negative range
    # without the moon: no occlusion anywhere
    obstruction, _ = los_geometry(sc, bore, 1e30)
    assert np.all(obstruction == 1e30)


def test_los_reduce_culled_matches_exact():
    """The two-stage block cull (Morton sort + cone-sphere prefilter +
    while_loop tile walk) is conservative by construction: radiance,
    npackets, and the used mask must match the exact O(S x N) reduction,
    including non-block-multiple N (NaN padding), narrow cones that cull
    most blocks, and wide cones that pass everything."""
    from nexoclom_tpu.ops.los import los_reduce_culled
    rng = np.random.default_rng(5)
    n = 5000                       # not a multiple of block=512
    r = rng.uniform(1.1, 8.0, n)
    costh = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    sinth = np.sqrt(1 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    w = jnp.asarray(rng.random(n))

    S = 40
    sc = rng.uniform(-10, 10, (S, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 9.0, 1.0)
    bore = -sc + rng.normal(0, 1.0, (S, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, dd = los_geometry(sc, bore, 10.0)
    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(dd))

    for dphi, quantity in ((math.radians(1.0), 'radiance'),
                           (math.radians(1.0), 'column'),
                           (math.radians(45.0), 'radiance')):
        rad, npack, used = los_reduce(px, py, pz, w, *args, dphi, RP_CM,
                                      quantity=quantity)
        rad_c, npack_c, used_c = los_reduce_culled(
            px, py, pz, w, *args, dphi, RP_CM, quantity=quantity,
            block=512)
        np.testing.assert_allclose(np.asarray(rad_c), np.asarray(rad),
                                   rtol=1e-12,
                                   err_msg=f'dphi={dphi} {quantity}')
        np.testing.assert_array_equal(np.asarray(npack_c),
                                      np.asarray(npack))
        np.testing.assert_array_equal(np.asarray(used_c), np.asarray(used))
        if dphi < math.radians(2.0):
            assert int(npack.sum()) < n * S          # cones actually sparse
        assert int(npack.sum()) > 0


def test_los_reduce_culled_walk_groups_bit_identical():
    """Multi-tile while_loop trips (walk_group > 1) only change how many
    dynamic slices run per trip: results must be BIT-identical to the
    single-tile walk for every group (masked past-k slots contribute
    exact zeros), including groups that do not divide the survivor
    count, walk_all=True (sphere test bypassed), and the tile-count
    output."""
    from nexoclom_tpu.ops.los import los_reduce_culled
    rng = np.random.default_rng(11)
    n = 5000
    r = rng.uniform(1.1, 8.0, n)
    costh = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    sinth = np.sqrt(1 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    w = jnp.asarray(rng.random(n))
    S = 40
    sc = rng.uniform(-10, 10, (S, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 9.0, 1.0)
    bore = -sc + rng.normal(0, 1.0, (S, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, dd = los_geometry(sc, bore, 10.0)
    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(dd))
    dphi = math.radians(1.0)

    rad1, npack1, used1, ks = los_reduce_culled(
        px, py, pz, w, *args, dphi, RP_CM, block=512,
        return_tile_counts=True)
    nblocks = -(-n // 512)
    ks = np.asarray(ks)
    assert ks.shape == (-(-S // 32),) and (ks >= 1).all() \
        and (ks <= nblocks).all()
    for walk_group in (2, 3, 8, 64):   # 64 > nblocks: single-trip walk
        for walk_all in (False, True):
            rad_g, npack_g, used_g = los_reduce_culled(
                px, py, pz, w, *args, dphi, RP_CM, block=512,
                walk_group=walk_group, walk_all=walk_all)
            np.testing.assert_array_equal(
                np.asarray(rad_g), np.asarray(rad1),
                err_msg=f'group={walk_group} walk_all={walk_all}')
            np.testing.assert_array_equal(np.asarray(npack_g),
                                          np.asarray(npack1))
            np.testing.assert_array_equal(np.asarray(used_g),
                                          np.asarray(used1))


def test_los_fitted_accumulate_culled_matches_dense():
    """The culled fitted-accumulate (Morton sort + cone-sphere prefilter +
    tile walk + per-tile X0 scatter-add) must reproduce the dense kernel's
    per-X0 sums — every weighting mode, non-multiple N, sparse and wide
    cones, with repeated X0 indices (multiple snapshots per trajectory)."""
    from nexoclom_tpu.ops.los import los_fitted_accumulate_culled
    rng = np.random.default_rng(23)
    n = 3001                       # not a block multiple
    n_x0 = 400                     # ~7.5 snapshots per trajectory
    r = rng.uniform(1.1, 8.0, n)
    costh = rng.uniform(-1, 1, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    sinth = np.sqrt(1 - costh ** 2)
    px = jnp.asarray(r * sinth * np.cos(phi))
    py = jnp.asarray(r * sinth * np.sin(phi))
    pz = jnp.asarray(r * costh)
    w = jnp.asarray(rng.random(n))
    x0 = jnp.asarray(rng.integers(0, n_x0, n))

    S = 40                         # not a chunk multiple
    sc = rng.uniform(-10, 10, (S, 3))
    sc /= np.maximum(np.linalg.norm(sc, axis=1, keepdims=True) / 9.0, 1.0)
    bore = -sc + rng.normal(0, 1.0, (S, 3))
    bore /= np.linalg.norm(bore, axis=1, keepdims=True)
    obstruction, dd = los_geometry(sc, bore, 10.0)
    ratio = jnp.asarray(rng.uniform(0.5, 2.0, S))
    mask = jnp.asarray(rng.random(S) > 0.2)
    sigma = jnp.asarray(rng.uniform(0.5, 1.5, S))
    args = (jnp.asarray(sc), jnp.asarray(bore), jnp.asarray(obstruction),
            jnp.asarray(dd), ratio, mask, sigma)

    for dphi in (math.radians(1.0), math.radians(45.0)):
        for use_weight in (None, 'dist', 'dist2', 'sigma'):
            rs, ss = los_fitted_accumulate(
                px, py, pz, w, x0, *args, dphi, n_x0=n_x0,
                use_weight=use_weight)
            rs_c, ss_c = los_fitted_accumulate_culled(
                px, py, pz, w, x0, *args, dphi, n_x0=n_x0,
                use_weight=use_weight, block=512)
            np.testing.assert_allclose(
                np.asarray(rs_c), np.asarray(rs), rtol=1e-10,
                err_msg=f'dphi={dphi} use_weight={use_weight}')
            np.testing.assert_allclose(
                np.asarray(ss_c), np.asarray(ss), rtol=1e-10)
            if use_weight == 'dist2':
                # multi-tile trips are bit-identical to the single-tile
                # walk (masked slots scatter exact zeros)
                rs_g, ss_g = los_fitted_accumulate_culled(
                    px, py, pz, w, x0, *args, dphi, n_x0=n_x0,
                    use_weight=use_weight, block=512, walk_group=3)
                np.testing.assert_array_equal(np.asarray(rs_g),
                                              np.asarray(rs_c))
                np.testing.assert_array_equal(np.asarray(ss_g),
                                              np.asarray(ss_c))
    assert float(jnp.sum(ss)) > 0


def test_resolve_cull_block(monkeypatch):
    """Backend-default routing: unset (None/'auto') picks the measured
    default per backend; explicit 0 is a dense opt-out; ints pass
    through unchanged."""
    import jax as _jax
    from nexoclom_tpu.ops import los as _los
    assert _los.resolve_cull_block(512) == 512
    assert _los.resolve_cull_block(0) == 0
    assert _los.resolve_cull_block(None) == 0          # CPU test backend
    assert _los.resolve_cull_block('auto') == 0
    # the density ball query culls even on CPU (measured 13.4x win)
    assert _los.resolve_cull_block(None, cpu_default=2048) == 2048
    monkeypatch.setattr(_jax, 'default_backend', lambda: 'tpu')
    assert _los.resolve_cull_block(None) == 4096
    assert _los.resolve_cull_block('auto', accel_default=2048) == 2048
    assert _los.resolve_cull_block(0) == 0             # opt-out survives
    assert _los.resolve_cull_block(0, cpu_default=2048) == 0
