"""Fused-observable simulation: integrate and accumulate images on device
without materialising trajectory history.

The reference's constant-step mode stores the full (npackets x 8 x nsteps)
trajectory tensor and post-processes it into images (``Output.py:376``,
``ModelImage.py``), which caps a chunk at ~200k packets per GiB.  Here the
sky-plane image accumulates *inside* the integration scan — every snapshot
scatter-adds its weighted position — so HBM holds only the packet state and
one (nx, nz) image, and a single chip sweeps through billions of packets in
catalog-free chunks.  This is the execution mode for the pod-scale ensemble
configurations in BASELINE.json.

Statistical identity with the stored-history path is exact: the accumulated
image equals ``ModelImage`` over an uncompressed Output's X rows (tested in
tests/test_fused.py); the same atoms-per-packet normalisation applies
(totalsource = sum(frac0) * nsteps).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nexoclom_tpu.atomicdata import gvalue_table
from nexoclom_tpu.initial_state.sampling import build_initial_state
from nexoclom_tpu.mathutils import rotation_matrix
from nexoclom_tpu.ops.histograms import histogram2d
from nexoclom_tpu.ops.integrator import (constant_step_driver,
                                         packet_state_from_dict,
                                         uniform_lookup)
from nexoclom_tpu.ops.pltable import compress_uniform, pl_lookup
from nexoclom_tpu.particle_tracking.output import (build_force_table,
                                                   build_surface_table,
                                                   engine_spec_from_inputs)
from nexoclom_tpu.solarsystem import planet_dist

CM_PER_KM = 1.0e5


def observer_rotation(subobslongitude: float, subobslatitude: float):
    """Sun-frame -> observer-frame rotation (``ModelImage.py:367-384``)."""
    p_sun = np.array([0.0, -1.0, 0.0])
    p_obs = np.array([np.sin(subobslongitude) * np.cos(subobslatitude),
                      -np.cos(subobslongitude) * np.cos(subobslatitude),
                      np.sin(subobslatitude)])
    if np.allclose(p_sun, p_obs):
        return np.eye(3)
    costh = np.clip(np.dot(p_sun, p_obs), -1.0, 1.0)
    return rotation_matrix(np.arccos(costh), np.cross(p_sun, p_obs))


def make_image_accumulator(M, xlo, xhi, nx, zlo, zhi, nz,
                           quantity: str, g_v0, g_dv, g_table,
                           vrplanet_model, apix_cm2, lookup_impl: str,
                           g_pl=None, hist_impl: str = 'auto', moons=()):
    """Static accumulator folding one snapshot into the sky image.

    Implements exactly the ModelImage weighting chain
    (``ModelImage.py:250-269``): observer-frame occultation, sun-frame
    shadow, g-value weighting (radiance), per-pixel area normalisation.
    ``g_pl``: compressed g(v) table used when ``lookup_impl == 'relu'``.
    ``moons``: ``(center, radius)`` spheres at their observation phases
    (satellite runs) that additionally occult packets toward the observer
    and shadow them from the sun, consistently with the LOS pipeline.
    """
    M = jnp.asarray(M)
    radiance = quantity in ('radiance', 'difrad')
    moons = tuple((np.asarray(c, float), float(r)) for c, r in moons)
    moons_obs = tuple((np.asarray(M) @ c, r) for c, r in moons)

    def accumulate(state, image):
        xo = M[0, 0] * state.x + M[0, 1] * state.y + M[0, 2] * state.z
        yo = M[1, 0] * state.x + M[1, 1] * state.y + M[1, 2] * state.z
        zo = M[2, 0] * state.x + M[2, 1] * state.y + M[2, 2] * state.z

        inview = (xo * xo + zo * zo > 1.0) | (yo < 0.0)
        for c_obs, r in moons_obs:
            behind_moon = (((xo - c_obs[0]) ** 2 + (zo - c_obs[2]) ** 2
                            < r * r) & (yo > c_obs[1]))
            inview = inview & ~behind_moon
        weight = state.frac * inview
        if radiance:
            out_of_shadow = (state.x ** 2 + state.z ** 2 > 1.0) | \
                (state.y < 0.0)
            for c, r in moons:
                in_moon_shadow = (((state.x - c[0]) ** 2 +
                                   (state.z - c[2]) ** 2 < r * r) &
                                  (state.y > c[1]))
                out_of_shadow = out_of_shadow & ~in_moon_shadow
            if lookup_impl == 'relu' and g_pl is not None:
                gg = pl_lookup(g_pl, state.vy + vrplanet_model)
            else:
                impl = 'dense' if lookup_impl == 'relu' else lookup_impl
                gg = uniform_lookup(g_table, g_v0, g_dv,
                                    state.vy + vrplanet_model, impl=impl)
            weight = weight * out_of_shadow * gg / 1e6
        weight = weight / apix_cm2
        return image + histogram2d(xo, zo, weight, xlo, xhi, nx,
                                   zlo, zhi, nz, impl=hist_impl)

    return accumulate


class FusedImage:
    """Result container mirroring ModelImage's public surface (image, axes,
    atoms_per_packet, totalsource) for fused runs."""

    def __init__(self, image, xaxis, zaxis, npackets, totalsource,
                 atoms_per_packet, quantity):
        self.image = image
        self.xaxis = xaxis
        self.zaxis = zaxis
        self.npackets = npackets
        self.totalsource = totalsource
        self.atoms_per_packet = atoms_per_packet
        self.quantity = quantity


def fused_image_run(inputs, npackets, params=None, seed=None, dtype=None,
                    chunk: int | None = None, mesh=None,
                    snapshot_stride: int = 1, stagger: bool = True,
                    hist_impl: str = 'auto', fast: bool = False) -> FusedImage:
    """Simulate ``npackets`` and return the sky image, never storing
    trajectories.  ``params`` follows ModelImage (quantity, dims, center,
    width, subobslongitude, subobslatitude).

    Packets run in chunks of ``chunk`` (default 2^20) through one compiled
    scan; arbitrary totals stream through fixed device memory.  With a
    ``mesh`` (from :func:`nexoclom_tpu.parallel.make_mesh`) each chunk's
    packet axis shards over the 'packets' mesh axis; the image scatter-add
    reduces across shards with the psum XLA inserts.

    ``snapshot_stride > 1`` subsamples the (correlated) trajectory
    snapshots k-fold — valid Monte Carlo subsampling with exact
    normalisation (totalsource = accumulated sample count); histogramming
    dominates fused runs on this TPU, so stride k raises throughput nearly
    k-fold at slightly higher image noise.  With ``stagger=True`` (default)
    the subsample is *stratified*: the packets of stratum t mod k
    accumulate at step t — strata are contiguous per-shard index blocks,
    stratum(p) = (p // m) % k with m = N/(k*shards), see
    ``ops/integrator._stagger_slice``; packets are i.i.d. so block
    membership is statistically arbitrary — so every timestep is
    represented (no aliasing) at the same cost; ``stagger=False`` keeps
    whole-batch snapshots at steps 0, k, 2k, ...

    ``hist_impl``: 'auto' (default; exact one-hot matmul below ~512x512
    bins on accelerators, measured 4-5x over scatter-add), 'matmul', or
    'scatter' — see ops/histograms.py.

    ``fast=True`` evaluates the radiation-pressure lookup once per step at
    the pre-step velocity instead of at every RK stage
    (``EngineSpec.radpres_per_stage=False``): measured 0.021% total
    radiance effect on the Na parity case vs a 1.5x integrator speedup on
    v5e; the default keeps the reference's per-stage evaluation.
    """
    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    params = params or {}
    quantity = params.get('quantity', 'column')
    dims = [int(d) for d in str(params.get('dims', '800,800')).split(',')]
    center = [float(c) for c in str(params.get('center', '0,0')).split(',')]
    width = [float(w) for w in str(params.get('width', '8,8')).split(',')]
    subobslongitude = float(params.get('subobslongitude', 0.0))
    subobslatitude = float(params.get('subobslatitude', np.pi / 2))

    if inputs.options.step_size == 0:
        raise ValueError('fused_image_run requires constant-step inputs '
                         '(options.step_size > 0)')
    if dtype is None:
        from nexoclom_tpu.utilities.config import get_config
        dtype = (jnp.float64 if get_config().precision == 'float64'
                 else jnp.float32)
    stagger = stagger and snapshot_stride > 1
    if chunk is None:
        chunk = min(int(npackets), 1 << 20)
    # chunks must divide by the shard count, and by stride x shards when
    # staggering (each shard slices its (N/k, k) groups locally)
    quantum = snapshot_stride if stagger else 1
    if mesh is not None:
        quantum *= mesh.shape['packets']
    chunk = max(quantum, chunk - chunk % quantum)
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2 ** 31))

    from nexoclom_tpu.initial_state.sections import effective_taa
    planet = inputs.geometry.planet
    radius_km = planet.radius
    aplanet, v_r = planet_dist(planet, effective_taa(inputs.geometry))
    vrplanet_model = v_r / radius_km

    spec = engine_spec_from_inputs(inputs)
    if fast:
        import dataclasses
        spec = dataclasses.replace(spec, radpres_per_stage=False)
    forces = build_force_table(inputs, aplanet, vrplanet_model, radius_km,
                               dtype)
    surface = build_surface_table(inputs, spec, radius_km, dtype)

    options = inputs.options
    nsteps = int(np.ceil(options.endtime / options.step_size) + 1)

    xlo, xhi = center[0] - width[0] / 2, center[0] + width[0] / 2
    zlo, zhi = center[1] - width[1] / 2, center[1] + width[1] / 2
    apix_cm2 = ((width[0] / dims[0]) * (width[1] / dims[1]) *
                (radius_km * CM_PER_KM) ** 2)
    M = observer_rotation(subobslongitude, subobslatitude)

    if quantity in ('radiance', 'difrad'):
        from nexoclom_tpu.data_simulation.model_result import (
            DEFAULT_WAVELENGTHS)
        waves = params.get('wavelength')
        if waves:
            waves = [float(w) for w in str(waves).split(',')]
        else:
            waves = DEFAULT_WAVELENGTHS[options.species]
        g_v0, g_dv, g_tab = gvalue_table(
            options.species, waves, aplanet,
            version=getattr(options, 'gvalue_version', 'Killen2009'))
        g_v0, g_dv = g_v0 / radius_km, g_dv / radius_km
        g_pl = compress_uniform(
            g_v0, g_dv, g_tab, rel_tol=1e-3,
            dtype=np.float64 if dtype == jnp.float64 else np.float32)
        g_tab = jnp.asarray(g_tab, dtype)
    else:
        g_v0, g_dv, g_tab, g_pl = 0.0, 1.0, jnp.zeros(2, dtype), None

    moons = ()
    if inputs.geometry.startpoint != inputs.geometry.planet.object:
        from nexoclom_tpu.initial_state.satellites import moon_occultors
        moons = moon_occultors(inputs.geometry)
    accumulator = make_image_accumulator(
        M.astype(np.float64 if dtype == jnp.float64 else np.float32),
        xlo, xhi, dims[0], zlo, zhi, dims[1], quantity,
        jnp.asarray(g_v0, dtype), jnp.asarray(g_dv, dtype), g_tab,
        jnp.asarray(vrplanet_model, dtype), jnp.asarray(apix_cm2, dtype),
        spec.lookup_impl, g_pl=g_pl, hist_impl=hist_impl, moons=moons)

    image = jnp.zeros(dims, dtype)
    totalsource = 0.0
    done = 0
    chunk_index = 0
    # constants uploaded once; per-chunk work is two dispatches (sampler +
    # driver) with no host synchronisation, so chunks pipeline on device
    step_dev = jnp.asarray(options.step_size, dtype)
    edge_dev = jnp.asarray(options.outeredge, dtype)
    radius_dev = jnp.asarray(radius_km, dtype)
    while done < npackets:
        this_chunk = min(chunk, npackets - done)
        this_chunk = max(quantum, this_chunk - this_chunk % quantum)
        x0 = build_initial_state(inputs, int(this_chunk),
                                 seed=seed + chunk_index, dtype=dtype)
        # initial frac is identically 1 (Output.py:147), so the chunk's
        # source contribution is its accumulated (packet, snapshot) sample
        # count: N/k packets every step when staggered, all N packets at
        # steps 0, k, 2k, ... otherwise
        if stagger:
            naccum = nsteps / snapshot_stride
        else:
            naccum = len(range(0, nsteps, snapshot_stride))
        totalsource += float(this_chunk) * naccum
        state0 = packet_state_from_dict(x0)
        if mesh is not None:
            from nexoclom_tpu.parallel.mesh import shard_state
            state0 = shard_state(state0, mesh)
        run_key = jax.random.PRNGKey((seed + chunk_index) ^ 0x5EED)
        _, _, image = constant_step_driver(
            state0, spec, forces, surface,
            step_dev, edge_dev, radius_dev, run_key,
            nsteps=nsteps, save_history=False,
            accumulator=accumulator, acc_init=image,
            acc_stride=snapshot_stride, acc_stagger=stagger,
            acc_shards=mesh.shape['packets'] if mesh is not None else 1)
        done += this_chunk
        chunk_index += 1

    atoms_per_packet = 1e23 / (totalsource / options.endtime)
    image_np = np.asarray(image, np.float64) * atoms_per_packet

    dx = (xhi - xlo) / dims[0]
    dz = (zhi - zlo) / dims[1]
    return FusedImage(
        image=image_np,
        xaxis=xlo + dx * (np.arange(dims[0]) + 0.5),
        zaxis=zlo + dz * (np.arange(dims[1]) + 0.5),
        npackets=int(npackets), totalsource=totalsource,
        atoms_per_packet=atoms_per_packet, quantity=quantity)
