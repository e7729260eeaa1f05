"""Hermetic test configuration.

Forces JAX onto the CPU backend with 8 virtual devices (so sharding tests run
without TPU hardware) and enables x64 for physics-invariant tests.  This must
run before jax initialises its backends, hence the env vars are set at import
time of this conftest.

The reference test suite requires a live PostgreSQL server and a developer
config file (``conftest.py:4-5`` in the reference); this suite is hermetic:
the catalog is redirected to a per-session temporary directory.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags +
                               ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', 'true')

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def hermetic_config(tmp_path_factory):
    """Point the catalog/savepath at a temp dir for every test."""
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
    savepath = tmp_path_factory.mktemp('modeloutput')
    set_config(NexoclomConfig(savepath=str(savepath), precision='float64'))
    yield
