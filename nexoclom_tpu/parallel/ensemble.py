"""Sharded ensemble simulation steps.

One compiled program that advances an ensemble of independent exosphere runs
(parameter sweeps over sources / species / true anomaly) with the packet axis
sharded over the ``'packets'`` mesh axis and the ensemble axis over
``'ensemble'`` — the TPU-native replacement for the reference's
Condor-job-per-run fan-out (``utilities/Condor.py``; SURVEY.md section 2.6).

The full step = sample sources on device -> integrate nsteps of RK5(4) ->
accumulate a column-density sky image per ensemble member.  All physics is
elementwise over packets; the only cross-device communication is the psum XLA
inserts when the per-member histogram reduces over the sharded packet axis.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from nexoclom_tpu.ops import samplers
from nexoclom_tpu.ops.histograms import histogram2d
from nexoclom_tpu.ops.integrator import (EngineSpec, ForceTable, PacketState,
                                         constant_step_driver)


def sample_uniform_flat_source(key, n: int, vprob, delv, endtime,
                               dtype=jnp.float32) -> PacketState:
    """On-device source: uniform surface, flat speed (km/s handled by the
    caller scaling vprob/delv into model units), isotropic angles."""
    k_sp, k_v, k_ang = jax.random.split(key, 3)
    lon, lat = samplers.sample_uniform_lonlat(
        k_sp, n, (0.0, 2 * math.pi), (-math.pi / 2, math.pi / 2), dtype=dtype)
    x, y, z = samplers.xyz_from_lonlat(lon, lat, 1.0)
    speed = samplers.sample_flat_speed(k_v, n, vprob, delv, dtype=dtype)
    alt, az = samplers.sample_isotropic_angles(
        k_ang, n, (0.0, math.pi / 2), (0.0, 2 * math.pi), dtype=dtype)
    vx, vy, vz = samplers.velocity_from_angles(alt, az, speed, x, y, z)
    zero = jnp.zeros(n, dtype=dtype)
    return PacketState(t=jnp.full(n, endtime, dtype=dtype),
                       x=x.astype(dtype), y=y.astype(dtype),
                       z=z.astype(dtype), vx=vx, vy=vy, vz=vz,
                       frac=jnp.ones(n, dtype=dtype), lossfrac=zero)


def make_ensemble_step(spec: EngineSpec, step_size: float, outeredge: float,
                       radius_km: float, nsteps: int, n_packets: int,
                       vprob_model: float, delv_model: float,
                       endtime: float, image_halfwidth: float = 8.0,
                       image_bins: int = 128, dtype=jnp.float32):
    """Build the jittable full ensemble step.

    Returns a function ``step(keys[E, 2], forces_stacked) -> (final_state,
    images[E, bins, bins])`` where ``forces_stacked`` is a ForceTable whose
    leaves carry a leading ensemble axis.
    """
    hw = image_halfwidth

    def single(key, forces: ForceTable):
        # independent streams for the source draw and the in-loop driver
        # randomness (bounce re-emission) — reusing one key both directly
        # and via split() correlates them (Output uses seed ^ 0x5EED for
        # the same reason)
        sample_key, run_key = jax.random.split(key)
        state0 = sample_uniform_flat_source(sample_key, n_packets,
                                            vprob_model, delv_model,
                                            endtime, dtype=dtype)
        final, _ = constant_step_driver(
            state0, spec, forces, None,
            jnp.asarray(step_size, dtype), jnp.asarray(outeredge, dtype),
            jnp.asarray(radius_km, dtype), run_key,
            nsteps=nsteps, save_history=False)
        image = histogram2d(final.x, final.z, final.frac,
                            -hw, hw, image_bins, -hw, hw, image_bins)
        return final, image

    def step(keys, forces_stacked: ForceTable):
        return jax.vmap(single)(keys, forces_stacked)

    return step


def stack_force_tables(tables: list[ForceTable]) -> ForceTable:
    """Stack per-ensemble-member force tables along a leading axis.

    All members must share table shapes (resample radpres tables to a common
    grid length before stacking)."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *tables)


def species_sweep_tables(members, planet, dtype=jnp.float32,
                         npoints: int = 512, rel_tol: float = 1e-3):
    """Stacked ForceTables for a (species x TAA) ensemble sweep.

    The multi-SPECIES parameter sweep is the north-star scale config
    (BASELINE.json; the reference fans one Condor job per ``.input`` file
    per species, ``utilities/Condor.py:21-105``).  Species differ in
    their radiation-pressure table (mass + g-values fold into the accel
    grid) and photoionization rate; TAA scales both through the
    heliocentric distance.  One mesh program needs equal leaf shapes, so:

    * every species' uniform radpres grid is built at ``npoints``;
    * each species is compressed ONCE at 1 AU and scaled per TAA
      (a(v; r) = a(v; 1 AU)/r^2 exactly on the same grid — independent
      compressions could pick different knot counts between borderline
      members);
    * compressed tables are padded to the sweep-wide max knot count with
      zero-slope knots (identical interpolants, ``ops.pltable.pad_pltable``).

    Parameters
    ----------
    members : iterable of (species, taa) pairs — e.g.
        ``[(s, t) for s in ('Na', 'Ca', 'Mg') for t in taas]``
    planet : SSObject

    Returns the stacked ForceTable (leading axis = member order).
    """
    import numpy as np

    from nexoclom_tpu.atomicdata import radpres_table
    from nexoclom_tpu.initial_state.loss_info import LossInfo
    from nexoclom_tpu.ops.integrator import empty_force_table
    from nexoclom_tpu.ops.pltable import compress_uniform, pad_pltable
    from nexoclom_tpu.solarsystem import planet_dist

    members = list(members)
    radius_km = planet.radius
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype.name)

    base = {}
    for species in {sp for sp, _ in members}:
        v0, dv, accel_1au = radpres_table(species, 1.0, npoints=npoints)
        pl_1au = compress_uniform(v0 / radius_km, dv / radius_km,
                                  accel_1au / radius_km, rel_tol=rel_tol,
                                  dtype=np_dtype)
        base[species] = (v0, dv, accel_1au, pl_1au)
    max_knots = max(pl.knots.shape[0] for _, _, _, pl in base.values())

    tables = []
    for species, taa in members:
        aplanet, vr = planet_dist(planet, float(taa))
        v0, dv, accel_1au, pl_1au = base[species]
        pl = pad_pltable(pl_1au, max_knots)
        scale = 1.0 / aplanet ** 2
        tables.append(empty_force_table(dtype)._replace(
            gm=jnp.asarray(planet.gm_rp3, dtype),
            vrplanet=jnp.asarray(vr / radius_km, dtype),
            rp_v0=jnp.asarray(v0 / radius_km, dtype),
            rp_dv=jnp.asarray(dv / radius_km, dtype),
            rp_accel=jnp.asarray(accel_1au * scale / radius_km, dtype),
            # base packs [y0, vmax]: scale the value, keep the clamp limit
            rp_pl=pl._replace(
                dslope=pl.dslope * scale,
                base=pl.base * jnp.asarray([scale, 1.0], pl.base.dtype)),
            ion_rate=jnp.asarray(LossInfo(species, 0.0, aplanet).photo,
                                 dtype)))
    return stack_force_tables(tables)
