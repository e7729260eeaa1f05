"""Persistent XLA compilation cache.

First compiles on the axon TPU platform are extremely slow (minutes for the
RK step graph, measured ~300 s); the persistent cache amortises them across
processes.  Called by bench.py, __graft_entry__.py, and Output; harmless on
CPU.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')


def enable_compilation_cache(cache_dir: str | None = None):
    import jax
    cache_dir = cache_dir or os.environ.get('NEXOCLOM_JAX_CACHE',
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass   # older jax versions: silently skip
    return cache_dir
