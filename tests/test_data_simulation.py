"""End-to-end data-simulation tests: LOSResult, ModelImage, ModelDensity,
source maps, and the fitted retrieval, over small simulation runs."""
import math
import os

import numpy as np
import pandas as pd
import pytest

from nexoclom_tpu.data_simulation import (LOSResult, LOSResultFitted,
                                          ModelDensity, ModelImage,
                                          SpacecraftData)
from nexoclom_tpu.initial_state import Input

pytestmark = pytest.mark.data_simulation

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


@pytest.fixture(scope='module')
def ca_run(tmp_path_factory):
    """A small completed Ca run shared by the tests in this module (module-
    scoped: one catalog for all)."""
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
    savepath = tmp_path_factory.mktemp('ca_run')
    set_config(NexoclomConfig(savepath=str(savepath), precision='float64'))
    inp = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    inp.options.endtime = 2400.0
    inp.run(2000, seed=99)
    return inp, str(savepath)


@pytest.fixture
def use_ca_catalog(ca_run):
    """Override the autouse hermetic config with the module run's catalog."""
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
    inp, savepath = ca_run
    set_config(NexoclomConfig(savepath=savepath, precision='float64'))
    return inp


def _spacecraft_data(radiance=None):
    """Synthetic spacecraft geometry: dawn-side views of the Ca spot."""
    n = 12
    angles = np.linspace(-0.4, 0.4, n)
    sc = np.stack([-8.0 * np.ones(n), np.zeros(n), 8.0 * angles], axis=1)
    bore = np.stack([np.ones(n), np.zeros(n), np.zeros(n)], axis=1)
    data = pd.DataFrame({
        'x': sc[:, 0], 'y': sc[:, 1], 'z': sc[:, 2],
        'xbore': bore[:, 0], 'ybore': bore[:, 1], 'zbore': bore[:, 2],
        'radiance': np.ones(n) if radiance is None else radiance,
        'sigma': 0.1 * np.ones(n),
        'alttan': np.abs(sc[:, 2]),
    })
    return SpacecraftData(data, species='Ca')


def test_losresult_radiance_and_fit(use_ca_catalog):
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    los = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), label='test')
    los.simulate_data_from_inputs(scdata)
    model = los.radiance.to_numpy()
    assert np.all(np.isfinite(model))
    assert model.max() > 0
    # the source-rate fit scales model onto data = 1 kR rows
    resid_num = np.sum(model * (1.0 - model))
    assert los.sourcerate > 0
    # closed-form LSQ check: refit by hand
    raw = model / los.sourcerate
    factor = np.sum(raw * scdata.data.radiance) / np.sum(raw ** 2)
    assert np.isclose(los.sourcerate, factor, rtol=1e-10)

    # caching: a second LOSResult restores without recompute
    los2 = LOSResult(scdata, inp, {'quantity': 'radiance'},
                     dphi=math.radians(3.0), label='test2')
    los2.simulate_data_from_inputs(scdata)
    assert np.allclose(los2.radiance.to_numpy(), model, rtol=1e-12)


def test_losresult_compute_dtype_crn(use_ca_catalog):
    """``compute_dtype`` forces the retrieval arithmetic precision over the
    SAME engine packets — the common-random-numbers accuracy probe
    (scripts/validate_accuracy.py --case fit-stage).  f32 and f64
    retrievals must agree closely but not bitwise (proof the dtype really
    routed), and the cached-iteration criteria keep them separate."""
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    f64 = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), label='cdt64',
                    compute_dtype='float64')
    f64.simulate_data_from_inputs(scdata)
    f32 = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), label='cdt32',
                    compute_dtype='float32')
    f32.simulate_data_from_inputs(scdata)
    a = f64.radiance.to_numpy()
    b = f32.radiance.to_numpy()
    scale = np.abs(a).max()
    assert scale > 0
    assert np.allclose(b, a, rtol=0, atol=2e-3 * scale)
    assert not np.array_equal(a, b)
    assert np.isclose(f32.sourcerate, f64.sourcerate, rtol=5e-3)


def test_losresult_cull_block_auto(use_ca_catalog):
    """'auto' is a valid cull_block spelling on every family member;
    on LOSResult it means unset (downstream resolve_cull_block picks
    the backend default block)."""
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    los = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), label='autocull',
                    cull_block='auto')
    assert los.cull_block is None
    los.simulate_data_from_inputs(scdata)
    assert np.all(np.isfinite(los.radiance.to_numpy()))


def test_fitted_compute_dtype_crn(use_ca_catalog):
    """``compute_dtype`` must reach the WHOLE fitted chain — the
    data/model accumulate AND the fitted-radiance reduce — so the CRN
    accuracy probe's retrieval-stage bound covers every device kernel.
    f32 and f64 fitted radiances agree closely but not bitwise."""
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                      dphi=math.radians(3.0), label='cdtfit')
    unfit.simulate_data_from_inputs(scdata)
    pattern = 1.0 + 0.5 * np.sin(np.linspace(0, np.pi, 12))
    scdata.data['radiance'] = unfit.radiance.to_numpy() * pattern
    scdata.data['sigma'] = 0.05 * scdata.data['radiance'].clip(lower=1e-3)
    unfit.determine_source_rate(scdata, use_weight=False)
    out = {}
    for dt in ('float64', 'float32'):
        fitted = LOSResultFitted(scdata, 'cdtfit', {'quantity': 'radiance'},
                                 compute_dtype=dt)
        fitted.determine_source_from_data(scdata)
        out[dt] = (fitted.radiance.to_numpy(), fitted.sourcerate)
    a, b = out['float64'][0], out['float32'][0]
    scale = np.abs(a).max()
    assert scale > 0
    assert np.allclose(b, a, rtol=0, atol=1e-2 * scale)
    assert not np.array_equal(a, b)
    assert np.isclose(out['float32'][1], out['float64'][1], rtol=2e-2)


def test_distribution_compute_dtype_routes():
    """The source-map smear rides the same compute_dtype switch: f32 and
    f64 device smears agree closely but not bitwise (proof the dtype
    reached the kernel)."""
    import pandas as pd

    from nexoclom_tpu.data_simulation.make_source_map import (
        DEFAULT_PARAMS, _distribution_for_x0)
    rng = np.random.default_rng(7)
    n = 500
    X0 = pd.DataFrame({
        'frac': rng.uniform(0.1, 1.0, n),
        'longitude': rng.uniform(0, 2 * np.pi, n),
        'latitude': rng.uniform(-np.pi / 2, np.pi / 2, n),
        'v': rng.uniform(0.1, 2.0, n) / 2440.0,     # R_p/s -> ~km/s
        'altitude': rng.uniform(0, np.pi / 2, n),
        'azimuth': rng.uniform(0, 2 * np.pi, n),
    })
    params = {**DEFAULT_PARAMS, 'nlonbins': 12, 'nlatbins': 6,
              'nvelbins': 5, 'naltbins': 4, 'nazbins': 4,
              'cull_block': 0}
    out = {}
    for dt in ('float64', 'float32'):
        p = {**params, 'compute_dtype': dt}
        out[dt] = _distribution_for_x0(X0, 2440.0, 3.0, p, 'source')
    a = out['float64']['abundance_uncor']
    b = out['float32']['abundance_uncor']
    assert np.allclose(b, a, rtol=1e-4, atol=1e-6 * np.abs(a).max())
    assert not np.array_equal(a, b)
    # counts are integer-exact in both precisions
    assert np.array_equal(out['float64']['n_included'],
                          out['float32']['n_included'])


def test_losresult_mask_dsl(use_ca_catalog):
    inp = use_ca_catalog
    rad = np.linspace(0.1, 3.0, 12)
    scdata = _spacecraft_data(radiance=rad)
    los = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), masking='minsnr5; minalt1.0',
                    label='masked')
    mask, siglim = los.make_mask(scdata.data)
    assert siglim is None
    expected = (rad / 0.1 > 5) & (np.abs(scdata.data.z) >= 1.0)
    assert np.array_equal(mask, expected)
    los.masking = 'middle50'
    mask, _ = los.make_mask(scdata.data)
    lo, hi = np.percentile(rad, [25, 75])
    assert np.array_equal(mask, (rad >= lo) & (rad <= hi))
    los.masking = 'bogus10'
    with pytest.raises(ValueError):
        los.make_mask(scdata.data)


def test_losresult_sharded_matches_unsharded(use_ca_catalog):
    """LOSResult(sharded=True) shards the cone reduction's packet axis over
    the 8 virtual devices; radiance, counts, and the used mask must match
    the single-device run (the flagship multi-chip switch, LOS side)."""
    from nexoclom_tpu.data_simulation.compute_iteration import (
        compute_iteration)
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    # distinct dphi: both iterations are computed fresh and their cached
    # rows never collide with the other tests' search criteria
    dphi = math.radians(2.2)
    plain = LOSResult(scdata, inp, {'quantity': 'radiance'}, dphi=dphi,
                      label='shard_ref')
    sharded = LOSResult(scdata, inp, {'quantity': 'radiance'}, dphi=dphi,
                        label='shard_tst', sharded=True)
    _, outputfiles, _, _ = inp.search()
    assert outputfiles
    r_plain = compute_iteration(plain, outputfiles[0], scdata)
    r_shard = compute_iteration(sharded, outputfiles[0], scdata)
    assert np.asarray(r_plain.npackets).sum() > 0
    np.testing.assert_allclose(np.asarray(r_shard.radiance),
                               np.asarray(r_plain.radiance), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(r_shard.npackets),
                                  np.asarray(r_plain.npackets))
    np.testing.assert_array_equal(np.asarray(r_shard.used_packets),
                                  np.asarray(r_plain.used_packets))


def test_fitted_retrieval_sharded(use_ca_catalog):
    """The fitted retrieval runs end to end with sharded=True (kernel-level
    equality is pinned in tests/test_parallel.py; this exercises the
    production plumbing: padding, the used-rows trim, and the reweighted
    Output save)."""
    inp = use_ca_catalog
    rad = np.linspace(0.5, 2.0, 12)
    scdata = _spacecraft_data(radiance=rad)
    dphi = math.radians(2.7)
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'}, dphi=dphi,
                      label='forfit_sh')
    unfit.simulate_data_from_inputs(scdata)
    fitted = LOSResultFitted(scdata, 'forfit_sh', {'quantity': 'radiance'},
                             sharded=True)
    fitted.determine_source_from_data(scdata)
    model = fitted.radiance.to_numpy()
    assert np.all(np.isfinite(model))
    assert model.max() > 0
    assert fitted.sourcerate > 0


def test_fitted_retrieval_sharded_matches_unsharded(use_ca_catalog,
                                                    monkeypatch):
    """End-to-end fitted retrieval equality: the sharded run must produce
    the same fitted radiance as the single-device run (kernel equality is
    pinned in test_parallel; this covers the full determine_source_from_data
    flow).  The iteration cache is bypassed so both runs actually compute."""
    from nexoclom_tpu.data_simulation.los_fitted import (
        LOSResultFitted as LRF)
    inp = use_ca_catalog
    rad = np.linspace(0.5, 2.0, 12)
    scdata = _spacecraft_data(radiance=rad)
    dphi = math.radians(2.4)
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'}, dphi=dphi,
                      label='ff_eq')
    unfit.simulate_data_from_inputs(scdata)

    monkeypatch.setattr(LRF, 'fitted_iteration_search',
                        lambda self, ufit_id: None)
    f_plain = LRF(scdata, 'ff_eq', {'quantity': 'radiance'})
    f_plain.determine_source_from_data(scdata)
    plain = f_plain.radiance.to_numpy().copy()
    plain_rate = f_plain.sourcerate

    f_sh = LRF(scdata, 'ff_eq', {'quantity': 'radiance'}, sharded=True)
    f_sh.determine_source_from_data(scdata)
    np.testing.assert_allclose(f_sh.radiance.to_numpy(), plain, rtol=1e-10)
    assert np.isclose(f_sh.sourcerate, plain_rate, rtol=1e-10)


def test_fitted_retrieval_culled_matches_plain(use_ca_catalog,
                                                monkeypatch):
    """End-to-end fitted retrieval through the block cull (cull_block on
    both the per-X0 accumulate and the fitted radiance re-evaluation,
    plain AND sharded): fitted radiance and source rate must match the
    dense run.  Kernel equality is pinned in test_los_ops/test_parallel;
    this covers the routing in determine_source_from_data."""
    from nexoclom_tpu.data_simulation.los_fitted import (
        LOSResultFitted as LRF)
    inp = use_ca_catalog
    rad = np.linspace(0.5, 2.0, 12)
    scdata = _spacecraft_data(radiance=rad)
    dphi = math.radians(2.4)
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'}, dphi=dphi,
                      label='ff_cull')
    unfit.simulate_data_from_inputs(scdata)

    monkeypatch.setattr(LRF, 'fitted_iteration_search',
                        lambda self, ufit_id: None)
    f_plain = LRF(scdata, 'ff_cull', {'quantity': 'radiance'})
    f_plain.determine_source_from_data(scdata)
    plain = f_plain.radiance.to_numpy().copy()
    plain_rate = f_plain.sourcerate

    f_cull = LRF(scdata, 'ff_cull', {'quantity': 'radiance'},
                 cull_block=256)
    f_cull.determine_source_from_data(scdata)
    np.testing.assert_allclose(f_cull.radiance.to_numpy(), plain,
                               rtol=1e-10)
    assert np.isclose(f_cull.sourcerate, plain_rate, rtol=1e-10)

    f_cs = LRF(scdata, 'ff_cull', {'quantity': 'radiance'},
               cull_block=256, sharded=True)
    f_cs.determine_source_from_data(scdata)
    np.testing.assert_allclose(f_cs.radiance.to_numpy(), plain,
                               rtol=1e-10)
    assert np.isclose(f_cs.sourcerate, plain_rate, rtol=1e-10)


def test_model_image_column(use_ca_catalog):
    inp = use_ca_catalog
    img = ModelImage(inp, {'quantity': 'column', 'dims': '64,64',
                           'width': '8,8'})
    assert img.image.shape == (64, 64)
    assert img.image.sum() > 0
    assert np.all(np.isfinite(img.image))
    # packets launched from the dawn spot -> column peaks off-centre
    assert img.packet_image.sum() > 0
    # cache hit on the second construction
    img2 = ModelImage(inp, {'quantity': 'column', 'dims': '64,64',
                            'width': '8,8'})
    assert np.allclose(img2.image, img.image)
    # radiance image also works and differs (g-weighting + shadow)
    img3 = ModelImage(inp, {'quantity': 'radiance', 'dims': '64,64',
                            'width': '8,8'})
    assert img3.image.sum() > 0
    # sharded over the 8 virtual devices (overwrite forces recompute):
    # per-pixel sums cross shards — equal up to f64 summation order
    # (~1e-7 relative at 1e5+ packets/pixel); integer packet counts are
    # exactly equal
    img4 = ModelImage(inp, {'quantity': 'column', 'dims': '64,64',
                            'width': '8,8'}, overwrite=True, sharded=True)
    np.testing.assert_allclose(img4.image, img.image, rtol=1e-6)
    np.testing.assert_array_equal(img4.packet_image, img.packet_image)


def test_model_image_display_and_export(use_ca_catalog, tmp_path):
    inp = use_ca_catalog
    img = ModelImage(inp, {'quantity': 'column', 'dims': '32,32'})
    png = tmp_path / 'im.png'
    img.display(savefile=str(png))
    assert png.exists() and png.stat().st_size > 1000
    out = tmp_path / 'im.json'
    img.export(str(out))
    import json
    loaded = json.loads(out.read_text())
    assert np.allclose(np.array(loaded['image']), img.image)
    # interactive HTML export (the reference's bokeh-page role): data
    # embedded inline, self-contained
    html = tmp_path / 'im.html'
    assert img.export_html(str(html)) == str(html)
    text = html.read_text()
    payload = json.loads(text.split('const D = ', 1)[1].split(';\n', 1)[0])
    assert np.allclose(np.array(payload['image']), img.image)
    assert len(payload['xaxis']) == img.image.shape[0]
    assert 'Ca column' in payload['label']
    with pytest.raises(TypeError):
        img.export_html(str(tmp_path / 'im.txt'))


def test_model_density(use_ca_catalog):
    inp = use_ca_catalog
    # probe points on a dawn-side arc near the spot
    pts = np.linspace(1.1, 3.0, 10)
    # explicit dense baseline (the default is now 'auto' = culled at
    # block 2048 on every backend — round-5 ladder)
    dens = ModelDensity(inp, -pts, np.zeros(10), np.zeros(10), dr=0.3,
                        cull_block=0)
    assert np.all(np.isfinite(dens.density))
    # the 'auto' default must equal the dense opt-out
    dens_auto = ModelDensity(inp, -pts, np.zeros(10), np.zeros(10), dr=0.3)
    np.testing.assert_allclose(dens_auto.density, dens.density, rtol=1e-12)
    np.testing.assert_array_equal(dens_auto.packets, dens.packets)
    # the ball-query block cull is exact
    dens_c = ModelDensity(inp, -pts, np.zeros(10), np.zeros(10), dr=0.3,
                          cull_block=128)
    np.testing.assert_allclose(dens_c.density, dens.density, rtol=1e-12)
    np.testing.assert_array_equal(dens_c.packets, dens.packets)
    assert dens.density.max() > 0
    # density falls off with altitude over the source region
    assert dens.density[0] > dens.density[-1]
    # reference Vpix formula (QUIRKS): 4/(3 pi) dr^3
    dr_cm = 0.3 * 2440.53 * 1e5
    assert np.isclose(dens.Vpix, 4 / 3 / np.pi * dr_cm ** 3)
    # sharded over the 8 virtual devices: per-point sums cross shards,
    # equal up to f64 summation order; counts exactly
    dens_sh = ModelDensity(inp, -pts, np.zeros(10), np.zeros(10), dr=0.3,
                           sharded=True)
    np.testing.assert_allclose(dens_sh.density, dens.density, rtol=1e-9)
    np.testing.assert_array_equal(dens_sh.packets, dens.packets)
    # sharded + culled: per-shard tile walks, one psum pair
    dens_sc = ModelDensity(inp, -pts, np.zeros(10), np.zeros(10), dr=0.3,
                           sharded=True, cull_block=128)
    np.testing.assert_allclose(dens_sc.density, dens.density, rtol=1e-9)
    np.testing.assert_array_equal(dens_sc.packets, dens.packets)


def test_density_reduce_culled_matches_dense():
    """Kernel-level: the ball-query cull (Morton sort + block spheres +
    probe reorder + tile walk) equals the dense chunked reduction on a
    random cloud and scattered probes, non-multiple shapes included."""
    import jax.numpy as jnp
    from nexoclom_tpu.data_simulation.model_density import (
        _density_reduce, _density_reduce_culled)
    rng = np.random.default_rng(31)
    n = 5003
    px = jnp.asarray(rng.normal(0, 3, n))
    py = jnp.asarray(rng.normal(0, 3, n))
    pz = jnp.asarray(rng.normal(0, 3, n))
    frac = jnp.asarray(rng.random(n))
    npts = 77
    qx = jnp.asarray(rng.uniform(-4, 4, npts))
    qy = jnp.asarray(rng.uniform(-4, 4, npts))
    qz = jnp.asarray(rng.uniform(-4, 4, npts))
    for dr in (0.05, 0.5):
        d_ref, c_ref = _density_reduce(px, py, pz, frac, qx, qy, qz, dr)
        d_c, c_c = _density_reduce_culled(px, py, pz, frac, qx, qy, qz,
                                          dr, block=256)
        np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_ref),
                                   rtol=1e-12, err_msg=f'dr={dr}')
        np.testing.assert_array_equal(np.asarray(c_c), np.asarray(c_ref))
        # multi-tile trips are bit-identical to the single-tile walk
        d_g, c_g = _density_reduce_culled(px, py, pz, frac, qx, qy, qz,
                                          dr, block=256, walk_group=3)
        np.testing.assert_array_equal(np.asarray(d_g), np.asarray(d_c))
        np.testing.assert_array_equal(np.asarray(c_g), np.asarray(c_c))
    assert int(c_ref.sum()) > 0


def test_source_map(use_ca_catalog):
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    los = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(3.0), label='srcmap')
    los.simulate_data_from_inputs(scdata)
    params = dict(nlonbins=36, nlatbins=18, nvelbins=20, naltbins=8,
                  nazbins=9)
    source, available = los.make_source_map(params)
    assert source.abundance.shape == (36, 18)
    # unfitted run: every sampled packet has frac > 0 at t=0 -> fraction 1
    sampled = source.n_total > 0
    assert np.all(source.fraction_observed[sampled] == 1.0)
    # the dawn spot (lon = 3pi/2) dominates the abundance
    lon_idx = np.unravel_index(np.argmax(source.abundance),
                               source.abundance.shape)[0]
    assert abs(source.longitude[lon_idx] - 3 * np.pi / 2) < 0.5
    # speed distribution integrates to the source rate
    dv = source.speed[1] - source.speed[0]
    total = source.speed_dist.sum() * dv
    assert np.isclose(total, los.sourcerate * 1e23, rtol=1e-6)
    assert available.abundance.shape == (36, 18)
    # end-to-end through the smear cull (params opt-in): same maps up to
    # f64 summation order across blocks
    source_c, available_c = los.make_source_map(
        dict(params, cull_block=512))
    np.testing.assert_allclose(source_c.abundance, source.abundance,
                               rtol=1e-9)
    np.testing.assert_array_equal(source_c.n_total, source.n_total)
    np.testing.assert_allclose(source_c.speed_dist_map,
                               source.speed_dist_map, rtol=1e-9, atol=1e-30)
    np.testing.assert_allclose(available_c.abundance, available.abundance,
                               rtol=1e-9)
    # sharded over the 8 virtual devices (dense and culled): per-shard
    # smears joined by one psum each — counts exact, sums to shard order
    source_s, _ = los.make_source_map(dict(params, sharded=True),
                                      do_available=False)
    np.testing.assert_allclose(source_s.abundance, source.abundance,
                               rtol=1e-9)
    np.testing.assert_array_equal(source_s.n_total, source.n_total)
    source_sc, _ = los.make_source_map(
        dict(params, sharded=True, cull_block=512), do_available=False)
    np.testing.assert_allclose(source_sc.abundance, source.abundance,
                               rtol=1e-9)
    np.testing.assert_array_equal(source_sc.n_total, source.n_total)


def test_smeared_point_stats_culled_matches_dense():
    """Kernel-level: the smear cull (unit-sphere Morton sort + block
    spheres + chord test + grid reorder + tile walk) equals the dense
    chunked smear on a clustered+background source, non-multiple shapes
    and the cos(latitude) radius scaling included."""
    import jax.numpy as jnp
    from nexoclom_tpu.data_simulation.make_source_map import (
        _smeared_point_stats, _smeared_point_stats_culled)
    rng = np.random.default_rng(7)
    n = 4007
    lat = np.clip(np.concatenate([rng.normal(0.2, 0.15, n // 2),
                                  rng.uniform(-np.pi / 2, np.pi / 2,
                                              n - n // 2)]),
                  -np.pi / 2, np.pi / 2)
    lon = np.concatenate([rng.normal(4.7, 0.2, n // 2) % (2 * np.pi),
                          rng.uniform(0, 2 * np.pi, n - n // 2)])
    w = rng.random(n)
    incl = w > 0.1
    v = rng.uniform(0, 5, n)
    alt = rng.uniform(0, np.pi / 2, n)
    az = rng.uniform(0, 2 * np.pi, n)
    nlon, nlat = 18, 9
    lonc = (np.arange(nlon) + 0.5) * 2 * np.pi / nlon
    latc = -np.pi / 2 + (np.arange(nlat) + 0.5) * np.pi / nlat
    glat, glon = np.meshgrid(latc, lonc)
    rad = np.radians(10) * np.cos(glat.ravel())
    args = (jnp.asarray(glat.ravel()), jnp.asarray(glon.ravel()),
            jnp.asarray(rad), jnp.asarray(lat), jnp.asarray(lon),
            jnp.asarray(w), jnp.asarray(incl), jnp.asarray(v),
            jnp.asarray(alt), jnp.asarray(az), 5.0, 10, 6, 5)
    ref = _smeared_point_stats(*args, chunk=32)
    cul = _smeared_point_stats_culled(*args, chunk=32, block=256)
    # the MXU one-hot histogram form (what 'auto' picks on TPU)
    cul_mm = _smeared_point_stats_culled(*args, chunk=32, block=256,
                                         hist_impl='matmul')
    # multi-tile trips: bit-identical to the single-tile walk
    cul_g = _smeared_point_stats_culled(*args, chunk=32, block=256,
                                        walk_group=3)
    for a, b in zip(cul, cul_g):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    for name, a, b, c in zip(('n_inc', 'n_tot', 'abund', 'vh', 'ah', 'zh'),
                             ref, cul, cul_mm):
        a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
        if a.dtype.kind in 'iu':
            np.testing.assert_array_equal(b, a, err_msg=name)
            np.testing.assert_array_equal(c, a, err_msg=name + ' (matmul)')
        else:
            np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-30,
                                       err_msg=name)
            np.testing.assert_allclose(c, a, rtol=1e-9, atol=1e-30,
                                       err_msg=name + ' (matmul)')
    assert int(np.asarray(ref[1]).sum()) > 0
    # edge cases: polar grid points (radius_scale -> 0: nothing near),
    # and every packet inside one cap (nothing culled)
    pole_args = (jnp.asarray(np.array([np.pi / 2 - 1e-9, -np.pi / 2])),
                 jnp.asarray(np.zeros(2)), jnp.asarray(np.zeros(2)))
    ref_p = _smeared_point_stats(*pole_args, *args[3:], chunk=2)
    cul_p = _smeared_point_stats_culled(*pole_args, *args[3:],
                                        chunk=2, block=256)
    np.testing.assert_array_equal(np.asarray(cul_p[1]), np.asarray(ref_p[1]))
    assert int(np.asarray(cul_p[1]).sum()) == 0
    tight = (jnp.asarray(np.full(3, 0.2)), jnp.asarray(np.full(3, 4.7)),
             jnp.asarray(np.full(3, np.pi)))   # radius pi: ALL packets near
    ref_t = _smeared_point_stats(*tight, *args[3:], chunk=2)
    cul_t = _smeared_point_stats_culled(*tight, *args[3:],
                                        chunk=2, block=256)
    np.testing.assert_array_equal(np.asarray(cul_t[1]), np.asarray(ref_t[1]))
    assert int(np.asarray(cul_t[1])[0]) == 4007


def test_fitted_retrieval(use_ca_catalog):
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                      dphi=math.radians(3.0), label='forfit')
    unfit.simulate_data_from_inputs(scdata)

    # synthetic "data": the model scaled by a smooth spatial pattern
    pattern = 1.0 + 0.5 * np.sin(np.linspace(0, np.pi, 12))
    scdata.data['radiance'] = unfit.radiance.to_numpy() * pattern
    scdata.data['sigma'] = 0.05 * scdata.data['radiance'].clip(lower=1e-3)
    unfit.determine_source_rate(scdata, use_weight=False)

    fitted = LOSResultFitted(scdata, 'forfit',
                             {'quantity': 'radiance'})
    fitted.determine_source_from_data(scdata)
    assert fitted.sourcerate > 0
    model_fit = fitted.radiance.to_numpy()
    model_unfit = unfit.radiance.to_numpy()
    obs = scdata.data.radiance.to_numpy()
    ok = obs > 0
    err_fit = np.abs(model_fit[ok] / obs[ok] - 1).mean()
    err_unfit = np.abs(model_unfit[ok] / obs[ok] - 1).mean()
    assert err_fit <= err_unfit + 1e-9
    # the fitted run is cataloged as a separate (fitted) output
    ids, files, npackets, _ = fitted.inputs.search()
    assert len(ids) >= 1
    # rerun uses the cache
    fitted2 = LOSResultFitted(scdata, 'forfit', {'quantity': 'radiance'})
    fitted2.determine_source_from_data(scdata)
    assert np.allclose(fitted2.radiance.to_numpy(), model_fit, rtol=1e-9)


def test_fitted_retrieval_weight_modes(use_ca_catalog):
    """All four fitted weighting modes run and produce usable retrievals."""
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                      dphi=math.radians(3.0), label='wmodes')
    unfit.simulate_data_from_inputs(scdata)
    scdata.data['radiance'] = unfit.radiance.to_numpy() * 1.3
    scdata.data['sigma'] = 0.05 * scdata.data['radiance'].clip(lower=1e-3)
    unfit.determine_source_rate(scdata, use_weight=False)

    results = {}
    for mode in (None, 'dist', 'dist2', 'sigma'):
        label = f'wmodes_{mode}'
        fitted = LOSResultFitted(scdata, 'wmodes', {'quantity': 'radiance'},
                                 label=label)
        fitted.determine_source_from_data(scdata, use_weight=mode,
                                          overwrite=True)
        model = fitted.radiance.to_numpy()
        assert np.all(np.isfinite(model)) and model.max() > 0
        results[mode] = model
    # a uniform 1.3x pattern is matched closely by every weighting mode
    obs = scdata.data.radiance.to_numpy()
    for mode, model in results.items():
        ok = obs > 0
        err = np.abs(model[ok] / obs[ok] - 1).mean()
        assert err < 0.15, (mode, err)


def test_worker_los_task(use_ca_catalog, tmp_path):
    """The worker CLI's 'los' task computes and catalogs an LOS iteration."""
    import json
    import subprocess
    import sys
    from nexoclom_tpu.utilities.config import get_config

    inp = use_ca_catalog
    _, files, _, _ = inp.search()
    scdata = _spacecraft_data()
    csv = tmp_path / 'sc.csv'
    scdata.data.to_csv(csv, index=False)
    payload = {'task': 'los', 'inputs': inp.to_dict(),
               'outputfile': files[0], 'scdata': str(csv), 'species': 'Ca',
               'params': {'quantity': 'radiance'}, 'query': 'worker-task',
               'dphi': math.radians(3.0)}
    pfile = tmp_path / 'payload.json'
    pfile.write_text(json.dumps(payload))
    r = subprocess.run(
        [sys.executable, '-m', 'nexoclom_tpu.worker', str(pfile)],
        capture_output=True, text=True,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu',
             'NEXOCLOM_SAVEPATH': get_config().savepath,
             'NEXOCLOM_TPU_CONFIG': ''})
    assert r.returncode == 0, r.stderr[-500:]
    from nexoclom_tpu.utilities.catalog import get_catalog
    rows = get_catalog().search_losmodels(quantity='radiance',
                                          query='worker-task',
                                          dphi=math.radians(3.0))
    assert rows and all(os.path.exists(row['filename']) for row in rows)


def test_los_on_adaptive_output(tmp_path_factory):
    """LOS radiance also works over adaptive-mode outputs (one snapshot per
    packet, steady-state time sampling)."""
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
    set_config(NexoclomConfig(
        savepath=str(tmp_path_factory.mktemp('adaptive_los')),
        precision='float64'))
    inp = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    inp.options.endtime = 1800.0
    inp.options.step_size = 0.0
    inp.options.resolution = 1e-4
    inp.run(1500, seed=41)
    scdata = _spacecraft_data()
    los = LOSResult(scdata, inp, {'quantity': 'radiance'},
                    dphi=math.radians(5.0), label='adaptive')
    los.simulate_data_from_inputs(scdata)
    model = los.radiance.to_numpy()
    assert np.all(np.isfinite(model)) and model.max() > 0


def test_params_from_file(use_ca_catalog, tmp_path):
    inp = use_ca_catalog
    pfile = tmp_path / 'format.txt'
    pfile.write_text('quantity = radiance   ; with a comment\n'
                     'dims = 16,16\n')
    img = ModelImage(inp, str(pfile))
    assert img.quantity == 'radiance'
    assert img.dims == [16, 16]


def test_fitted_use_selected_subsampling(use_ca_catalog):
    """use_selected keeps at most one snapshot per trajectory, drawn from the
    global time grid (reference LOSResultFitted.py:96-113 semantics)."""
    inp = use_ca_catalog
    scdata = _spacecraft_data()
    unfit = LOSResult(scdata, inp, {'quantity': 'radiance'},
                      dphi=math.radians(3.0), label='sel')
    unfit.simulate_data_from_inputs(scdata)
    scdata.data['radiance'] = unfit.radiance.to_numpy() * 1.1
    unfit.determine_source_rate(scdata, use_weight=False)

    fitted = LOSResultFitted(scdata, 'sel', {'quantity': 'radiance'},
                             label='sel_fitted')
    fitted.determine_source_from_data(scdata, use_selected=True,
                                      overwrite=True)
    # the saved fitted output holds <= 1 row per trajectory
    from nexoclom_tpu.particle_tracking import Output
    out = Output.restore(fitted.outputfiles[0])
    counts = out.X.groupby('Index').size()
    assert counts.max() == 1
    assert len(out.X) < out.npackets + 1   # some trajectories dropped
    assert np.all(np.isfinite(fitted.radiance.to_numpy()))


def test_image_overwrite_recomputes(use_ca_catalog):
    inp = use_ca_catalog
    params = {'quantity': 'column', 'dims': '20,20'}
    img1 = ModelImage(inp, dict(params))
    from nexoclom_tpu.utilities.catalog import get_catalog
    n_before = len(get_catalog().images.records())
    img2 = ModelImage(inp, dict(params), overwrite=True)
    n_after = len(get_catalog().images.records())
    assert n_after == n_before          # old record replaced, not duplicated
    assert np.allclose(img2.image, img1.image)


def test_delete_files_selective(use_ca_catalog):
    inp = use_ca_catalog
    ids, files, n_before, _ = inp.search()
    assert len(files) >= 1
    # add one more chunk, then delete only it
    inp.run(n_before + 500, packs_per_it=500, seed=77)
    ids2, files2, n_mid, _ = inp.search()
    new_files = [f for f in files2 if f not in files]
    assert len(new_files) == 1
    inp.delete_files(filename=new_files[0])
    ids3, files3, n_after, _ = inp.search()
    assert n_after == n_before
    assert new_files[0] not in files3
    assert not os.path.exists(new_files[0])


def test_moon_centered_image_f26():
    """params['origin'] = a moon (quirk F26): the image is measured from
    the MOVING moon's center in moon radii — the reference's origin
    parameter crashes for any non-planet (transform_reference_frame does
    not exist).  The young Io cloud is centered in the moon frame but
    sits at Io's orbital position in the planet frame, and both frames
    hold the same total atom count."""
    inp = Input(os.path.join(INPUTFILES, 'jupiter_io_satellite.input'))
    inp.options.endtime = 1800.0
    inp.options.step_size = 30.0
    inp.run(300, seed=21)

    moon_img = ModelImage(inp, {'quantity': 'column', 'dims': '64,64',
                                'width': '16,16', 'origin': 'Io'})
    planet_img = ModelImage(inp, {'quantity': 'column', 'dims': '64,64',
                                  'width': '16,16'})
    assert moon_img.origin.object == 'Io'
    total_moon = moon_img.image.sum()
    assert total_moon > 0
    # centroid near the moon in the moon frame (R_Io)
    wx = (moon_img.image.sum(axis=1) @ moon_img.xaxis) / total_moon
    wz = (moon_img.image.sum(axis=0) @ moon_img.zaxis) / total_moon
    assert abs(wx) < 3.0 and abs(wz) < 3.0
    # planet frame: centroid at Io's orbital position (phi=1 ->
    # x=-a sin 1, y=a cos 1; pole-on default view shows x and y)
    a_io = 421800.0 / 71492.0
    total_p = planet_img.image.sum()
    px = (planet_img.image.sum(axis=1) @ planet_img.xaxis) / total_p
    assert abs(px - (-a_io * np.sin(1.0))) < 1.0
    # same cloud, same atoms: sum(column) x pixel area agrees across
    # frames (both capture essentially the whole cloud)
    atoms_moon = total_moon * moon_img.Apix
    atoms_planet = total_p * planet_img.Apix
    assert atoms_moon == pytest.approx(atoms_planet, rel=0.15)

    from nexoclom_tpu.utilities.exceptions import InputError
    with pytest.raises(InputError):
        ModelImage(inp, {'quantity': 'column', 'origin': 'Ganymede'})
