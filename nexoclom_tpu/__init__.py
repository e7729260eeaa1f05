"""nexoclom_tpu — a TPU-native Monte Carlo model of planetary exospheres.

A ground-up JAX/XLA rebuild of the capabilities of ``nexoclom``
(Neutral EXosphere and CLOud Model): collisionless test-particle transport
through gravity + solar radiation pressure with photoionization loss and
surface sticking/re-emission, driven by the same plain-text input-file format,
producing line-of-sight radiance/column, sky-plane images, point densities,
source maps, and fitted source retrievals.

Design differences from the reference (see SURVEY.md and docs/):

* the particle engine is a jitted ``lax.scan``/``while_loop`` over a fixed
  packet batch with masked (lockstep) predication — no pandas, no compaction;
* persistence is a JSON manifest + ``.npz`` array store — no PostgreSQL;
* importing this package has **no side effects** (the reference boots a
  database at import time);
* the packet axis shards over a ``jax.sharding.Mesh`` for multi-chip runs.

Public API parity with ``nexoclom/__init__.py:9-14``: ``Input``, ``Output``,
``LOSResult``, ``LOSResultFitted``, ``ModelImage``, ``SSObject`` (plus
``ModelDensity`` and ``get_config``).
"""
from __future__ import annotations

__version__ = '0.1.0'

_LAZY = {
    'Input': 'nexoclom_tpu.initial_state.input_class',
    'Output': 'nexoclom_tpu.particle_tracking.output',
    'LOSResult': 'nexoclom_tpu.data_simulation.los_result',
    'LOSResultFitted': 'nexoclom_tpu.data_simulation.los_fitted',
    'ModelImage': 'nexoclom_tpu.data_simulation.model_image',
    'ModelDensity': 'nexoclom_tpu.data_simulation.model_density',
    'SSObject': 'nexoclom_tpu.solarsystem.ssobject',
    'SourceMap': 'nexoclom_tpu.initial_state.sourcemap',
    'SpacecraftData': 'nexoclom_tpu.data_simulation.spacecraft_data',
    'fused_image_run': 'nexoclom_tpu.particle_tracking.fused',
    'get_config': 'nexoclom_tpu.utilities.config',
}


def __getattr__(name):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
    import importlib
    module = importlib.import_module(target)
    value = getattr(module, name)
    globals()[name] = value
    return value


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
