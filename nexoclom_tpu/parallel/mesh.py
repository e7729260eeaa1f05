"""Device meshes and shardings for multi-chip runs.

The reference scales out with HTCondor job fan-out joined through a PostgreSQL
catalog (``utilities/Condor.py``, SURVEY.md section 2.6).  The TPU-native
equivalents here:

* **packet data parallelism** — the packet axis of every engine array shards
  over the ``'packets'`` mesh axis; the physics is elementwise so no
  collectives are needed until observables reduce (histograms / LOS sums),
  where XLA inserts the psum;
* **ensemble parallelism** — independent runs (parameter sweeps, species,
  TAA grids) stack on a leading axis sharded over ``'ensemble'``; compute is
  vmapped, so one compiled program advances the whole sweep.

A 2-D ``Mesh(('ensemble', 'packets'))`` covers both; single-axis meshes are
the degenerate cases.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_ensemble: int = 1, n_packet_shards: int | None = None,
              devices=None) -> Mesh:
    """Create an ('ensemble', 'packets') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_packet_shards is None:
        n_packet_shards = len(devices) // n_ensemble
    count = n_ensemble * n_packet_shards
    grid = np.asarray(devices[:count]).reshape(n_ensemble, n_packet_shards)
    return Mesh(grid, ('ensemble', 'packets'))


def packet_sharding(mesh: Mesh, with_ensemble: bool = False) -> NamedSharding:
    """Sharding for engine arrays: (N,) over 'packets', or (E, N) over
    ('ensemble', 'packets')."""
    spec = P('ensemble', 'packets') if with_ensemble else P('packets')
    return NamedSharding(mesh, spec)


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-ensemble parameters: leading axis over 'ensemble',
    remaining axes replicated."""
    return NamedSharding(mesh, P('ensemble'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh, with_ensemble: bool = False):
    """Place a PacketState (or any pytree of packet arrays) onto the mesh."""
    sharding = packet_sharding(mesh, with_ensemble)
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), state)


def resolve_packet_mesh(sharded, caller: str = 'resolve_packet_mesh'):
    """Resolve the public ``sharded`` switch to a mesh (or None).

    ``sharded=False`` -> None (single-device); ``sharded=True`` -> a fresh
    1 x n_local_devices ('ensemble', 'packets') mesh; ``sharded=<Mesh>`` ->
    the caller's mesh, validated to carry a ``'packets'`` axis.  Shared by
    ``Output(sharded=...)``, ``LOSResult(sharded=...)`` and the fitted
    retrieval so every flagship entry point resolves the switch identically.
    """
    if not sharded:
        return None
    if hasattr(sharded, 'devices'):
        if 'packets' not in sharded.axis_names:
            from nexoclom_tpu.utilities.exceptions import InputError
            raise InputError(caller,
                             "sharded mesh needs a 'packets' axis "
                             "(parallel.make_mesh builds one)")
        return sharded
    return make_mesh(n_ensemble=1, n_packet_shards=len(jax.devices()))


def shard_padded(mesh: Mesh, arrays, pad_values):
    """Pad (N,) arrays to a multiple of the packet-shard count and place
    them over the mesh's ``'packets'`` axis.

    ``pad_values`` supplies one fill value per array so callers can choose
    sentinels the downstream kernel treats as inert (e.g. a far-away
    position plus zero weight for the LOS reduction).  Returns
    ``(sharded_arrays, pad)``; trailing ``pad`` rows of any per-packet
    output must be dropped by the caller.
    """
    import jax.numpy as jnp
    n_shards = int(mesh.shape['packets'])
    n = arrays[0].shape[0]
    pad = (-n) % n_shards
    sharding = packet_sharding(mesh)
    out = []
    for arr, fill in zip(arrays, pad_values):
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.full((pad,), fill, arr.dtype)])
        out.append(jax.device_put(arr, sharding))
    return out, pad
