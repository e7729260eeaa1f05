"""Output: run one simulation chunk and persist it.

Mirrors the orchestration of ``nexoclom/particle_tracking/Output.py`` with a
TPU-native execution model:

* host side builds scalar physics parameters and lookup tables in model units
  (R_planet, s): GM (``Output.py:105``), heliocentric distance and radial
  velocity from the TAA (``:108-110``), photoionization rate (``:113-118``),
  the radiation-pressure table (``:121-128``), and the surface-interaction
  emission-speed table when bouncing (``:131-133``);
* initial states are sampled on device (:mod:`nexoclom_tpu.initial_state.sampling`)
  with the reference's steady-state time trick: constant-step packets all
  start with the full endtime, adaptive packets get a uniform random age
  (``:136-139``);
* the whole integration is one jitted driver call
  (:mod:`nexoclom_tpu.ops.integrator`);
* results persist as a float32 ``.npz`` plus a JSON catalog record (replacing
  the PostgreSQL insert + pickle of ``Output.save``, ``:480-548``), with
  ``compress=True`` dropping frac == 0 rows exactly like the reference.

Public attributes match the reference: ``X0`` and ``X`` (pandas DataFrames),
``npackets``, ``totalsource``, ``aplanet`` (AU), ``vrplanet`` (km/s, positive
away from the Sun), ``GM`` (R_p^3/s^2, negative), ``idnum``, ``filename``,
``compress``, ``inputs``, and for constant-step runs ``nsteps``.
"""
from __future__ import annotations

import json
import os
import time

import jax.numpy as jnp
import numpy as np
import pandas as pd

from nexoclom_tpu.atomicdata import radpres_table
from nexoclom_tpu.initial_state.loss_info import LossInfo
from nexoclom_tpu.initial_state.sections import effective_taa
from nexoclom_tpu.initial_state.sampling import build_initial_state
from nexoclom_tpu.ops.integrator import (EngineSpec, ForceTable, PacketState,
                                         SurfaceTable,
                                         adaptive_production_run,
                                         constant_step_driver,
                                         empty_force_table,
                                         packet_state_from_dict)
from nexoclom_tpu.ops.surface import build_emission_speed_table
from nexoclom_tpu.solarsystem import planet_dist
from nexoclom_tpu.utilities.catalog import get_catalog
from nexoclom_tpu.utilities.config import get_config

X0_COLUMNS = ['time', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac', 'v',
              'longitude', 'latitude', 'local_time', 'altitude', 'azimuth']


def _block_frame(cols: dict) -> pd.DataFrame:
    """Frame from stored columns with the f32 -> f64 / int32 -> int64
    upcast done while filling ONE [C, N] block pandas adopts zero-copy.
    A dict-of-columns frame re-copies every column at construction
    (~2 s at 4M rows x 14 columns, measured); this is one pass.
    Column order (= store key order) is preserved."""
    if not cols:
        return pd.DataFrame()
    names = list(cols)
    floaty = [n for n in names
              if cols[n].dtype in (np.float32, np.float64)]
    if len(floaty) < 2:
        return pd.DataFrame({
            n: (v.astype(np.float64) if v.dtype == np.float32 else
                v.astype(np.int64) if v.dtype == np.int32 else v)
            for n, v in cols.items()})
    n_rows = len(cols[names[0]])
    buf = np.empty((len(floaty), n_rows), np.float64)
    for i, name in enumerate(floaty):
        buf[i] = cols[name]                  # upcast during the fill
    frame = pd.DataFrame(buf.T, columns=floaty, copy=False)
    for name in names:                       # ascending insert positions
        if name not in floaty:
            values = cols[name]
            if values.dtype == np.int32:
                values = values.astype(np.int64)
            frame.insert(names.index(name), name, values)
    return frame


_PULL_SLICE_BYTES = int(os.environ.get('NEXOCLOM_PULL_SLICE_MB', '64')) << 20


def _pull_into(dst: np.ndarray, src) -> None:
    """Fill host view ``dst`` from ``src`` (same shape; device or host
    array), pulling device arrays above the slice quantum in bounded
    slices along the leading axis: one stacked 235 MB d2h transfer
    stalled the axon tunnel for minutes (377/981 s measured,
    .round5/62_e2e_quiet.log) while <=64 MB pulls never have, and the
    ~25-50 ms per-slice dispatch latency is the cheap side of that
    trade.  ``NEXOCLOM_PULL_SLICE_MB`` tunes the quantum.  Host numpy
    sources are a single (possibly strided) copy."""
    import jax
    if not isinstance(src, jax.Array) or src.nbytes <= _PULL_SLICE_BYTES:
        dst[...] = np.asarray(src, dst.dtype)
        return
    n = int(src.shape[0])
    step = max(1, _PULL_SLICE_BYTES // max(src.nbytes // max(n, 1), 1))
    for i0 in range(0, n, step):
        dst[i0:i0 + step] = np.asarray(src[i0:i0 + step], dst.dtype)


def engine_spec_from_inputs(inputs) -> EngineSpec:
    """Map Input sections onto the static engine configuration."""
    sint = inputs.surfaceinteraction
    from nexoclom_tpu.initial_state.sections import surface_bounces
    full_stick = not surface_bounces(sint)
    satellite = (inputs.geometry.startpoint !=
                 inputs.geometry.planet.object)
    planet_fixed = False
    if sint.sticktype == 'surface map':
        # works here — the reference's engine asserts on this path
        # (bouncepackets.py:90-91); see ops/surface.build_sticking_map
        planet_fixed = 'planet' in _load_sticking_sourcemap(
            sint).coordinate_system
    from nexoclom_tpu.ops.integrator import default_lookup_impl
    return EngineSpec(
        gravity=inputs.forces.gravity,
        radpres=inputs.forces.radpres,
        constant_rate=inputs.options.lifetime > 0,
        surface_bounce=not full_stick,
        sticktype=sint.sticktype,
        accom=bool(getattr(sint, 'accomfactor', None)),
        stick_map_planet_fixed=planet_fixed,
        # satellite sources (quirk F16): the moon's own gravity (gated on
        # forces.gravity like the planet's), its shadow (an illumination
        # effect — always on), and re-impact removal — or thermal
        # re-emission from the moon when the surface interaction bounces
        # (quirk F21)
        moon_gravity=satellite and inputs.forces.gravity,
        moon_shadow=satellite,
        moon_impact=satellite,
        # surface-map sticking is planet-fixed, so a satellite run keeps
        # the map-driven bounce on the PLANET but falls back to removal
        # semantics on the moon (moon_bounce off) — there is no moon-fixed
        # map to bounce against (advisor round 2; docs/QUIRKS.md F14)
        moon_bounce=(satellite and not full_stick
                     and sint.sticktype != 'surface map'),
        # extra loss channels (quirk F22): constant electron-impact /
        # charge-exchange rates, off unless the input sets them
        eimp=bool(getattr(inputs.options, 'eimp_rate', 0.0)),
        chx=bool(getattr(inputs.options, 'chx_rate', 0.0)),
        eimp_profile=bool(getattr(inputs.options, 'eimp_profile', None)),
        eimp_phi=_profile_has_phi(getattr(inputs.options, 'eimp_profile',
                                          None), inputs.options),
        eimp_tilt=bool(getattr(inputs.options, 'eimp_tilt', 0.0)),
        check_outer_edge=inputs.options.outeredge < 1e29,
        lookup_impl=default_lookup_impl(),
        # 'stage' (default) -> True; 'tangent' -> 'tangent'; 'step' -> False
        radpres_per_stage={'tangent': 'tangent', 'step': False}.get(
            getattr(inputs.options, 'radpres_mode', 'stage'), True),
    )


def _profile_has_phi(profile, options=None) -> bool:
    """Whether the eimp profile carries a longitude factor (quirk F28) —
    a static engine property, so the spec must know before tracing.
    (The load is memoized in loss_profile, so the force-table build reads
    the same parse.)  Raises when ``eimp_phi_phase`` is set but the file
    has no phi factor — a silently ignored phase would be wrong science."""
    if not profile:
        return False
    from nexoclom_tpu.initial_state.loss_profile import load_loss_profile
    has_phi = load_loss_profile(profile)[4] is not None
    if (not has_phi and options is not None
            and getattr(options, 'eimp_phi_phase', None) is not None):
        from nexoclom_tpu.utilities.exceptions import InputError
        raise InputError('engine_spec_from_inputs',
                         'options.eimp_phi_phase is set but the '
                         'eimp_profile file has no phi/rate_phi '
                         'longitude factor')
    return has_phi


_STICK_MAP_CACHE: dict = {}

# zlib crossover for Output.save: stores above this skip deflate (f32 MC
# noise compresses ~17% while the pass costs ~6x the raw write — measured
# at 16M packets, docs/scaling.md)
_SAVE_COMPRESS_MAX = 256 * 1024 * 1024


def _load_sticking_sourcemap(sint):
    """Load the sticking SourceMap, cached by (path, mtime) so edited or
    regenerated map files are picked up and the cache stays bounded."""
    import os
    from nexoclom_tpu.initial_state.sourcemap import SourceMap
    from nexoclom_tpu.utilities.exceptions import InputError
    mapfile = sint.stick_mapfile
    if mapfile == 'default' or not os.path.exists(mapfile):
        # the reference prints a warning and defers the crash
        # (input_classes.py:280-284 -> bouncepackets assert); fail clearly
        raise InputError('engine_spec_from_inputs',
                         f'surfaceinteraction.stick_mapfile {mapfile!r} '
                         f'does not exist')
    cache_key = (mapfile, os.path.getmtime(mapfile))
    if cache_key in _STICK_MAP_CACHE:
        return _STICK_MAP_CACHE[cache_key]
    sourcemap = SourceMap(mapfile)
    if sourcemap.abundance is None:
        raise InputError('engine_spec_from_inputs',
                         f'no abundance in stick_mapfile {mapfile}')
    if len(_STICK_MAP_CACHE) > 32:
        _STICK_MAP_CACHE.clear()
    _STICK_MAP_CACHE[cache_key] = sourcemap
    return sourcemap


# max deviation of the compressed a(v) lookup from np.interp on the full
# table, as a fraction of the table maximum (ops/pltable.py); 0.1% of the
# radpres acceleration is far below the Monte Carlo noise of any run
RADPRES_PL_TOL = 1e-3


def build_force_table(inputs, aplanet: float, vrplanet_model: float,
                      radius_km: float, dtype,
                      pl_tol: float = RADPRES_PL_TOL) -> ForceTable:
    """Physics tables in model units."""
    options = inputs.options
    table = empty_force_table(dtype)
    table = table._replace(
        gm=jnp.asarray(inputs.geometry.planet.gm_rp3, dtype),
        vrplanet=jnp.asarray(vrplanet_model, dtype))

    if inputs.forces.radpres:
        from nexoclom_tpu.ops.pltable import compress_uniform
        v0, dv, accel = radpres_table(
            options.species, aplanet,
            version=getattr(options, 'gvalue_version', 'Killen2009'))
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        table = table._replace(
            rp_v0=jnp.asarray(v0 / radius_km, dtype),
            rp_dv=jnp.asarray(dv / radius_km, dtype),
            rp_accel=jnp.asarray(accel / radius_km, dtype),
            rp_pl=compress_uniform(v0 / radius_km, dv / radius_km,
                                   accel / radius_km, rel_tol=pl_tol,
                                   dtype=np_dtype))

    if options.lifetime > 0:
        rate = 1.0 / options.lifetime
    else:
        rate = LossInfo(options.species, options.lifetime, aplanet).photo
    table = table._replace(ion_rate=jnp.asarray(rate, dtype))
    # extra loss channels (quirk F22) ride their own ForceTable fields —
    # they are NOT folded into ion_rate because the engine applies
    # different shadow masking per channel (state_eval)
    eimp = getattr(options, 'eimp_rate', 0.0)
    chx = getattr(options, 'chx_rate', 0.0)
    if eimp:
        table = table._replace(eimp_rate=jnp.asarray(eimp, dtype))
    if chx:
        table = table._replace(chx_rate=jnp.asarray(chx, dtype))
    profile = getattr(options, 'eimp_profile', None)
    if profile:
        # quirk F23: separable torus profile; the file is already in model
        # units (planet radii, 1/s) so no conversion
        from nexoclom_tpu.initial_state.loss_profile import profile_tables
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        rho_pl, z_pl, terms, phi_pl, cp_terms = profile_tables(
            profile, dtype=np_dtype, rel_tol=pl_tol)
        table = table._replace(eimp_rho_pl=rho_pl, eimp_z_pl=z_pl,
                               eimp_pl_terms=terms,
                               eimp_cp_terms=cp_terms)
        # co-rotation rate shared by the F25 tilt and the F28/F29
        # longitude structure: options.eimp_tilt_period or the planet's
        # sidereal spin
        import math
        period_hr = getattr(options, 'eimp_tilt_period',
                            inputs.geometry.planet.rotperiod)
        rot_omega = 2.0 * math.pi / (period_hr * 3600.0)
        if phi_pl is not None or cp_terms:
            # quirk F28: longitude-structured co-rotating factor;
            # quirk F29: the CP triples carry h_k(phi) directly
            table = table._replace(
                eimp_phi_pl=phi_pl,
                eimp_phi_phase=jnp.asarray(
                    math.radians(getattr(options, 'eimp_phi_phase', 0.0)),
                    dtype),
                eimp_rot_omega=jnp.asarray(rot_omega, dtype))
        tilt_deg = getattr(options, 'eimp_tilt', 0.0)
        if tilt_deg:
            # quirk F25: centrifugal-equator tilt co-rotating with the
            # planet; phase given at observation (t=0)
            tilt_rad = math.radians(tilt_deg)
            table = table._replace(
                eimp_tilt_sin=jnp.asarray(math.sin(tilt_rad), dtype),
                eimp_tilt_cos=jnp.asarray(math.cos(tilt_rad), dtype),
                eimp_tilt_phase=jnp.asarray(
                    math.radians(getattr(options, 'eimp_tilt_phase', 0.0)),
                    dtype),
                eimp_tilt_omega=jnp.asarray(rot_omega, dtype))

    if inputs.geometry.startpoint != inputs.geometry.planet.object:
        from nexoclom_tpu.initial_state.satellites import satellite_params
        a_rp, omega, phi_obs, moon_radius, moon_gm = satellite_params(
            inputs.geometry)
        table = table._replace(
            moon_gm=jnp.asarray(moon_gm, dtype),
            moon_a=jnp.asarray(a_rp, dtype),
            moon_omega=jnp.asarray(omega, dtype),
            moon_phi=jnp.asarray(phi_obs, dtype),
            moon_radius=jnp.asarray(moon_radius, dtype))
    return table


def build_surface_table(inputs, spec: EngineSpec, radius_km: float,
                        dtype, taa=None) -> SurfaceTable:
    """Surface-interaction parameters; the emission-speed table is built only
    when thermal accommodation is active."""
    sint = inputs.surfaceinteraction
    if taa is None:
        taa = effective_taa(inputs.geometry)
    moon_fields = {}
    extra_range = None
    if spec.moon_bounce:
        # moon-local surface temperature model (quirk F21): same functional
        # form, dayside amplitude rescaled to the system's heliocentric
        # distance (the raw Mercury calibration would be ~2.5x too hot at
        # Jupiter)
        from nexoclom_tpu.initial_state.surface_temperature import (
            moon_dayside_amplitude)
        aplanet, _ = planet_dist(inputs.geometry.planet, taa)
        moon_t0 = 100.0
        moon_t1 = moon_dayside_amplitude(aplanet)
        moon_fields = dict(moon_t0=jnp.asarray(moon_t0, dtype),
                           moon_t1=jnp.asarray(moon_t1, dtype))
        extra_range = (moon_t0, moon_t0 + moon_t1)
    if spec.accom:
        v_table, temp0, dtemp = build_emission_speed_table(
            taa, inputs.options.species, radius_km, extra_range=extra_range)
    else:
        v_table, temp0, dtemp = np.zeros((2, 2)), 0.0, 1.0
    A = getattr(sint, 'A', (0.0, 0.0, 0.0))
    map_fields = {}
    if spec.sticktype == 'surface map':
        from nexoclom_tpu.ops.surface import build_sticking_map
        from nexoclom_tpu.utilities.exceptions import InputError
        sourcemap = _load_sticking_sourcemap(sint)
        stick_map, lon0, dlon, lat0, dlat = build_sticking_map(sourcemap)
        subsolarlon = getattr(sint, 'subsolarlon', None)
        if spec.stick_map_planet_fixed and subsolarlon is None:
            raise InputError('build_surface_table',
                             'surfaceinteraction.subsolarlon is required '
                             'for a planet-fixed sticking map')
        map_fields = dict(
            stick_map=jnp.asarray(stick_map, dtype),
            map_lon0=jnp.asarray(lon0, dtype),
            map_dlon=jnp.asarray(dlon, dtype),
            map_lat0=jnp.asarray(lat0, dtype),
            map_dlat=jnp.asarray(dlat, dtype),
            map_subsolarlon=jnp.asarray(subsolarlon or 0.0, dtype))
    return SurfaceTable(
        stickcoef=jnp.asarray(getattr(sint, 'stickcoef', 0.0) or 0.0, dtype),
        accomfactor=jnp.asarray(getattr(sint, 'accomfactor', 0.0) or 0.0,
                                dtype),
        stick_A=jnp.asarray(A, dtype),
        taa=jnp.asarray(taa, dtype),
        v_table=jnp.asarray(v_table, dtype),
        temp0=jnp.asarray(temp0, dtype),
        dtemp=jnp.asarray(dtemp, dtype),
        **map_fields, **moon_fields)


class Output:
    def __init__(self, inputs, npackets, compress=True, run_model=True,
                 seed=None, dtype=None, sharded=False):
        self.inputs = inputs
        self.planet = inputs.geometry.planet
        self.compress = compress
        self.seed = seed
        # wall-clock decomposition of this chunk (tables / sample / kernel /
        # assemble / save), populated as stages complete; the reference's
        # only equivalent is a per-100-steps print (Output.py:354-355).
        # Logged through the package logger when NEXOCLOM_TRACE_STAGES is
        # set (utilities.tracing.setup_logging to see it).
        self.stage_seconds = {}
        _stage_t0 = time.perf_counter()

        def _stage(name):
            nonlocal _stage_t0
            now = time.perf_counter()
            self.stage_seconds[name] = round(
                self.stage_seconds.get(name, 0.0) + (now - _stage_t0), 3)
            _stage_t0 = now
            if os.environ.get('NEXOCLOM_TRACE_STAGES'):
                from nexoclom_tpu.utilities.tracing import logger
                logger.info('Output stage %s: %.3f s', name,
                            self.stage_seconds[name])
        self._stage = _stage

        if not run_model:
            self.X0 = pd.DataFrame()
            self.X = pd.DataFrame()
            self.npackets = npackets
            self.totalsource = float(npackets)
            r, v_r = planet_dist(self.planet, effective_taa(inputs.geometry))
            self.aplanet, self.vrplanet = r, v_r
            self.GM = self.planet.gm_rp3
            self.save()
            return

        # satellite start points WORK here (quirk F16) — the reference
        # raises 'Satellite start points not set up' (Output.py:153-155);
        # starttime-based moon phases come from the vendored mean
        # ephemeris / user registry (quirk F24)

        if dtype is None:
            dtype = (jnp.float64 if get_config().precision == 'float64'
                     else jnp.float32)
        self._dtype = dtype

        from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
        enable_compilation_cache()

        radius_km = self.planet.radius
        self.GM = self.planet.gm_rp3
        taa = effective_taa(inputs.geometry)
        self.taa = taa
        r, v_r = planet_dist(self.planet, taa)
        self.aplanet = r                       # AU
        self.vrplanet = v_r                    # km/s
        vrplanet_model = v_r / radius_km       # R_p/s

        spec = engine_spec_from_inputs(inputs)
        forces = build_force_table(inputs, self.aplanet, vrplanet_model,
                                   radius_km, dtype)
        surface = build_surface_table(inputs, spec, radius_km, dtype)
        _stage('tables')

        if seed is None:
            seed = int(np.random.SeedSequence().entropy % (2 ** 31))
            self.seed = seed
        x0 = build_initial_state(inputs, int(npackets), seed=seed,
                                 dtype=dtype)
        self.npackets = int(npackets)

        # Per-COLUMN device->host pulls (~16 MB each at 4M packets): a
        # single stacked 235 MB pull stalls the axon tunnel for minutes
        # (377/981 s measured, .round5/62_e2e_quiet.log) while 16 MB
        # pulls never have; the ~25-50 ms per-transfer round trip is the
        # cheap side of that trade.  The columns fill ONE [C, N] block
        # pandas adopts zero-copy (a dict-of-columns frame re-copies
        # every column at construction).
        _x0_exc = []

        def _build_x0_frame():
            try:
                buf = np.empty((len(X0_COLUMNS), int(npackets)), np.float64)
                for i, col in enumerate(X0_COLUMNS):
                    _pull_into(buf[i], x0[col])      # upcast during fill
                self.X0 = pd.DataFrame(buf.T, columns=X0_COLUMNS,
                                       copy=False)
                # same f64 host sum as before, off the already-pulled frame
                self.totalsource = float(self.X0['frac'].to_numpy().sum())
            except BaseException as exc:   # re-raised at the join point
                _x0_exc.append(exc)

        # NEXOCLOM_OVERLAP_PULL=1 pulls the X0 frame on a helper thread
        # while the main thread runs the integrator — the d2h copy of
        # the (already computed) stack can overlap kernel execution.
        # Opt-in while the axon runtime's concurrent-transfer behavior
        # is being measured (scripts/tpu_stages/63_e2e_overlap.sh).
        x0_thread = None
        if os.environ.get('NEXOCLOM_OVERLAP_PULL') == '1':
            import threading
            x0_thread = threading.Thread(target=_build_x0_frame)
            x0_thread.start()
        else:
            _build_x0_frame()
            if _x0_exc:
                raise _x0_exc[0]
        _stage('sample')

        def _join_x0():
            if x0_thread is not None:
                x0_thread.join()
            if _x0_exc:
                raise _x0_exc[0]

        state0 = packet_state_from_dict(x0)
        options = inputs.options
        import jax
        run_key = jax.random.PRNGKey(seed ^ 0x5EED)

        # sharded=True spreads the packet axis over every local device
        # (sharded=<Mesh> uses the caller's mesh): the elementwise physics
        # needs no collectives, so XLA runs each shard on its own chip —
        # the constant-step loop as plain GSPMD sharding, the adaptive
        # path through adaptive_production_run(mesh=...) (per-shard pool
        # loops for large batches, a sharded while_loop otherwise).
        # Identical physics either way (tests/test_parallel.py).
        self._shard_pad = 0
        from nexoclom_tpu.parallel.mesh import (resolve_packet_mesh,
                                                shard_state)
        mesh = resolve_packet_mesh(sharded, 'Output.__init__')
        if mesh is not None:
            # NamedSharding needs the packet axis divisible by the shard
            # count: pad with dead packets (t=0, frac=0 — both drivers
            # treat them as finished lanes) and drop them at assembly
            self._shard_pad = (-int(npackets)) % int(mesh.shape['packets'])
            if self._shard_pad:
                state0 = jax.tree.map(
                    lambda leaf: jnp.concatenate(
                        [leaf, jnp.zeros((self._shard_pad,), leaf.dtype)]),
                    state0)
            state0 = shard_state(state0, mesh)

        if options.step_size != 0:
            self.nsteps = int(np.ceil(options.endtime /
                                      options.step_size) + 1)
            final, history = constant_step_driver(
                state0, spec, forces, surface,
                jnp.asarray(options.step_size, dtype),
                jnp.asarray(options.outeredge, dtype),
                jnp.asarray(radius_km, dtype),
                run_key, nsteps=self.nsteps, save_history=True)
            _join_x0()
            self.totalsource *= self.nsteps
            from nexoclom_tpu.utilities.tracing import device_barrier
            device_barrier(final.t)
            _stage('kernel')
            if self._shard_pad:
                history = jax.tree.map(lambda leaf: leaf[:, :self.npackets],
                                       history)
            self.X = self._assemble_history(state0, history)
            _stage('assemble')
        else:
            # baked variant: tables as compile-time constants — 4x faster
            # while-loop iterations on axon v5e (ops/integrator.py).
            # inner_steps=4 amortises the per-iteration cond (another
            # +23% measured); trajectories are identical, the loop can
            # only overrun by up to 3 all-dead iterations.  The router
            # picks the measured-best orchestration: sequential
            # sub-batches inside the validated lane envelope
            # (ADAPTIVE_LANE_ENVELOPE: a 4M-lane loop faulted the TPU
            # worker once), or the device-resident in-loop pool refill
            # for large batches (ONE dispatch, ~2x lane occupancy —
            # docs/scaling.md); options.adaptive_orchestrator overrides.
            # post-parse step_size=0 mutation leaves resolution=None;
            # apply the parse-time default (sections.py) instead of
            # crashing — the reference would TypeError here too
            resolution = (1e-4 if options.resolution is None
                          else options.resolution)
            final, iterations = adaptive_production_run(
                state0, spec, forces, surface,
                jnp.asarray(resolution, dtype),
                jnp.asarray(options.outeredge, dtype),
                jnp.asarray(radius_km, dtype), run_key,
                orchestrator=getattr(options, 'adaptive_orchestrator',
                                     'auto'),
                inner_steps=4, mesh=mesh)
            _join_x0()
            if isinstance(final.t, jax.Array):
                # the pool orchestrators return host numpy (already
                # synced); only device results need the barrier
                from nexoclom_tpu.utilities.tracing import device_barrier
                device_barrier(final.t)
            _stage('kernel')
            if self._shard_pad:
                final = jax.tree.map(lambda leaf: leaf[:self.npackets],
                                     final)
            self.X = self._assemble_final(final)
            _stage('assemble')

        self.save()
        _stage('save')

    # ------------------------------------------------------------ assembly
    def _assemble_history(self, state0: PacketState, history) -> pd.DataFrame:
        """Long-format trajectory table: every packet x every step snapshot
        (reference ``Output.py:433-449``), packet-major ordering."""
        n = self.npackets
        nsteps = self.nsteps

        x0 = self.X0
        names = ['time', 'x', 'y', 'z', 'vx', 'vy', 'vz', 'frac',
                 'lossfrac']
        initials = [x0['time'], x0['x'], x0['y'], x0['z'], x0['vx'],
                    x0['vy'], x0['vz'], x0['frac'], np.zeros(n)]
        columns = [history.t, history.x, history.y, history.z, history.vx,
                   history.vy, history.vz, history.frac, history.lossfrac]
        # fill one [9, N*nsteps] block in place -> zero-copy frame (a
        # dict-of-columns frame would re-copy every column; the per-
        # column concatenate+reshape allocated each twice)
        buf = np.empty((9, n * nsteps), np.float64)
        for i, (initial, column) in enumerate(zip(initials, columns)):
            view = buf[i].reshape(n, nsteps)
            # step 0 = initial state, steps 1.. from the scan
            view[:, 0] = np.asarray(initial, np.float64)
            # bounded-slice pull: a history column is N x nsteps x 4 B
            # (~0.5 GB at the 1-GiB chunk budget) — far above the
            # measured stacked-pull stall threshold
            _pull_into(view[:, 1:].T, column)
        out = pd.DataFrame(buf.T, columns=names, copy=False)
        out.insert(0, 'Index', np.repeat(np.arange(n), nsteps))
        return out

    def _assemble_final(self, final: PacketState) -> pd.DataFrame:
        """Adaptive-mode result: one row per packet (reference keeps the
        initial v/altitude/azimuth columns alongside the final state,
        ``Output.py:185-190,361-366``).  Device-resident leaves (the
        chunked/constant drivers) come back in per-LEAF transfers: a
        single stacked ~200 MB pull can stall the axon tunnel for
        minutes (the X0 finding — 377/981 s measured on a 235 MB stack,
        .round5/62_e2e_quiet.log) while per-column pulls never have, and
        the ~25-50 ms per-transfer latency x 9 leaves is the cheap side
        of that trade.  The pool orchestrators already return host
        numpy, for which np.asarray is free."""
        leaves = list(final)   # t x y z vx vy vz frac lossfrac
        # one [12, N] block -> zero-copy frame (see _build_x0_frame),
        # filled leaf-by-leaf (pull + f64 upcast in one pass, no
        # intermediate [9, N] stack)
        buf = np.empty((12, int(final.t.shape[0])), np.float64)
        for i in range(8):                   # time x y z vx vy vz frac
            _pull_into(buf[i], leaves[i])
        buf[8] = self.X0['v'].values
        buf[9] = self.X0['altitude'].values
        buf[10] = self.X0['azimuth'].values
        _pull_into(buf[11], leaves[8])       # lossfrac
        out = pd.DataFrame(
            buf.T, columns=['time', 'x', 'y', 'z', 'vx', 'vy', 'vz',
                            'frac', 'v', 'altitude', 'azimuth', 'lossfrac'],
            copy=False)
        out['Index'] = out.index
        return out

    # ---------------------------------------------------------- persistence
    def save(self):
        """Catalog the run and write the array store."""
        from nexoclom_tpu.utilities.debug import debug_enabled, validate_output
        if debug_enabled():
            validate_output(self)
        catalog = get_catalog()
        self.idnum, self.filename = catalog.insert_output(
            self.inputs.to_dict(), self.npackets, self.totalsource)

        X = self.X
        if self.compress and len(X):
            X = X[X.frac > 0]
        self.X = X

        arrays = {}
        for name, frame in (('X0', self.X0), ('X', X)):
            for col in frame.columns:
                values = frame[col].to_numpy()
                if values.dtype == np.float64:
                    values = values.astype(np.float32)
                elif values.dtype == np.int64:
                    values = values.astype(np.int32)
                arrays[f'{name}.{col}'] = values

        meta = {
            'idnum': self.idnum,
            'npackets': self.npackets,
            'totalsource': self.totalsource,
            'aplanet': float(self.aplanet),
            'vrplanet': float(self.vrplanet),
            'GM': float(self.GM),
            'nsteps': getattr(self, 'nsteps', None),
            'seed': self.seed,
            'compress': self.compress,
            'inputs': self.inputs.to_dict(),
        }
        arrays['meta'] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
        # atomic publish: the catalog record was inserted above, but
        # search_outputs ignores records whose file does not exist — write
        # to a temp path and rename so a crash mid-write never leaves a
        # partial .npz that readers would count as completed work.
        # zlib only pays below _SAVE_COMPRESS_MAX bytes: f32 Monte Carlo
        # states barely deflate (17% at 16M packets) while the deflate
        # pass dominates the save (95 s vs 16 s measured) — large stores
        # go uncompressed; np.load reads either transparently
        tmp = self.filename + '.tmp.npz'
        raw_bytes = sum(a.nbytes for a in arrays.values())
        saver = (np.savez_compressed if raw_bytes <= _SAVE_COMPRESS_MAX
                 else np.savez)
        with open(tmp, 'wb') as f:
            saver(f, **arrays)
        os.replace(tmp, self.filename)

    def save_from_store(self, source_filename: str,
                        replace=('X.frac', 'X0.frac')):
        """Catalog + write this Output as a copy of ``source_filename``'s
        array store with this instance's reweighted columns.

        The fitted retrieval rescales ONLY ``frac`` (reference
        ``LOSResultFitted.py:184-214``) yet persists a full Output; a
        restore-all + save-all round trip pays an f32 -> f64 -> f32
        convert of every untouched column at production packet counts.
        Here untouched columns stream raw (f32 -> f32 is exact, so the
        written store is bit-identical to the full round trip); columns
        named in ``replace`` come from this instance's frames, which is
        all a column-pruned restore needs to carry.  Same atomic
        tmp-write + zlib crossover as :meth:`save`.
        """
        catalog = get_catalog()
        self.idnum, self.filename = catalog.insert_output(
            self.inputs.to_dict(), self.npackets, self.totalsource)

        arrays = {}
        with np.load(source_filename) as data:
            for key in data.files:
                if key == 'meta':
                    continue
                if key in replace:
                    name, col = key.split('.', 1)
                    values = getattr(self, name)[col].to_numpy()
                    if values.dtype == np.float64:
                        values = values.astype(np.float32)
                    arrays[key] = values
                else:
                    arrays[key] = data[key]
        meta = {
            'idnum': self.idnum,
            'npackets': self.npackets,
            'totalsource': self.totalsource,
            'aplanet': float(self.aplanet),
            'vrplanet': float(self.vrplanet),
            'GM': float(self.GM),
            'nsteps': getattr(self, 'nsteps', None),
            'seed': self.seed,
            'compress': self.compress,
            'inputs': self.inputs.to_dict(),
        }
        arrays['meta'] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
        tmp = self.filename + '.tmp.npz'
        raw_bytes = sum(a.nbytes for a in arrays.values())
        saver = (np.savez_compressed if raw_bytes <= _SAVE_COMPRESS_MAX
                 else np.savez)
        with open(tmp, 'wb') as f:
            saver(f, **arrays)
        os.replace(tmp, self.filename)

    @classmethod
    def restore(cls, filename: str, columns=None) -> 'Output':
        """Rebuild an Output (float64 frames) from its array store
        (reference ``Output.py:550-572``).

        ``columns`` optionally restricts which frame columns are
        deserialized: a dict mapping frame name (``'X0'``, ``'X'``) to a
        sequence of column names, or to ``None`` for every column of
        that frame; a frame absent from the dict comes back as an empty
        DataFrame.  Loaded columns are identical (same f32 -> f64
        upcast) to a full restore — the restriction only skips the
        read + upcast + frame assembly of unused columns, which
        dominates restore wall time at production packet counts on this
        single-CPU host (a 4M-row store: ~25x between a full and a
        4-column restore).  Scalar attributes (``npackets``,
        ``totalsource``, ...) always load from the meta record.
        Requesting a column the store lacks raises ``KeyError``.
        """
        from nexoclom_tpu.initial_state.input_class import Input

        with np.load(filename) as data:
            meta = json.loads(bytes(data['meta']).decode())
            frames = {'X0': {}, 'X': {}}
            for key in data.files:
                if key == 'meta':
                    continue
                name, col = key.split('.', 1)
                if columns is not None:
                    want = columns.get(name, ())
                    if want is not None and col not in want:
                        continue
                frames[name][col] = data[key]
        if columns is not None:
            for name, want in columns.items():
                missing = set(want or ()) - set(frames.get(name, {}))
                if missing:
                    raise KeyError(
                        f'{sorted(missing)} not in the {name} store of '
                        f'{filename}')

        output = cls.__new__(cls)
        output.inputs = Input.from_dict(meta['inputs'])
        output.planet = output.inputs.geometry.planet
        output.X0 = _block_frame(frames['X0'])
        output.X = _block_frame(frames['X'])
        output.idnum = meta['idnum']
        output.filename = filename
        output.npackets = meta['npackets']
        output.totalsource = meta['totalsource']
        output.aplanet = meta['aplanet']
        output.vrplanet = meta['vrplanet']
        output.GM = meta['GM']
        output.seed = meta['seed']
        output.compress = meta['compress']
        if meta['nsteps'] is not None:
            output.nsteps = meta['nsteps']
        return output

    def __len__(self):
        return self.npackets

    def __getitem__(self, keys):
        """Subset the result rows in place (reference ``Output.__getitem__``,
        ``Output.py:218-219``)."""
        self.X = self.X.iloc[keys]

    def __str__(self):
        return (f'Output for {self.planet.object}: {self.npackets} packets, '
                f'a={self.aplanet:.4f} AU, vr={self.vrplanet:.3f} km/s')
