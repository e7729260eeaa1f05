"""Hermetic test configuration.

Forces JAX onto the CPU backend with 8 virtual devices (so sharding tests run
without TPU hardware) and enables x64 for physics-invariant tests.

Note: this environment preloads ``jax`` at interpreter startup with the axon
TPU plugin, so ``JAX_PLATFORMS`` in the environment is ignored; the platform
must be selected through ``jax.config`` before any backend initialises
(backends are not yet initialised at conftest-import time).

The reference test suite requires a live PostgreSQL server and a developer
config file (``conftest.py:4-5`` in the reference); this suite is hermetic:
the catalog is redirected to a per-session temporary directory.
"""
import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags +
                               ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def hermetic_config(tmp_path_factory):
    """Point the catalog/savepath at a temp dir for every test."""
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
    savepath = tmp_path_factory.mktemp('modeloutput')
    set_config(NexoclomConfig(savepath=str(savepath), precision='float64'))
    yield
