"""Machine configuration.

Replaces the reference's ``NexoclomConfig`` (``utilities/NexoclomConfig.py:12-141``)
with two deliberate changes:

1. **No database service.**  The reference requires a running PostgreSQL server
   and will attempt to start one at import time.  Here the run catalog is a
   JSON manifest + array files under ``savepath`` (see
   :mod:`nexoclom_tpu.utilities.catalog`), so the only configuration that
   matters is where outputs live.
2. **No import side effects.**  ``import nexoclom_tpu`` never touches the
   filesystem; the config is loaded lazily on first use.

Configuration file format (same ``key = value`` grammar as the reference):

.. code-block:: text

    savepath = /path/to/model/output
    precision = float32        ; or float64 (CPU validation)

Resolution order: ``$NEXOCLOM_TPU_CONFIG`` file path, then
``~/.nexoclom_tpu`` if it exists, then built-in defaults with
``savepath = ~/nexoclom_tpu_output`` (overridable via ``$NEXOCLOM_SAVEPATH``).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

from nexoclom_tpu.utilities.exceptions import ConfigfileError

_ENV_CONFIG = 'NEXOCLOM_TPU_CONFIG'
_ENV_SAVEPATH = 'NEXOCLOM_SAVEPATH'
_DEFAULT_CONFIGFILE = os.path.expanduser('~/.nexoclom_tpu')


@dataclass
class NexoclomConfig:
    savepath: str
    precision: str = 'float32'
    extras: dict = field(default_factory=dict)

    @classmethod
    def load(cls, configfile: str | None = None) -> 'NexoclomConfig':
        if configfile is None:
            configfile = os.environ.get(_ENV_CONFIG) or None
        if configfile is None and os.path.exists(_DEFAULT_CONFIGFILE):
            configfile = _DEFAULT_CONFIGFILE

        values: dict[str, str] = {}
        if configfile is not None:
            if not os.path.exists(configfile):
                raise ConfigfileError(configfile, 'configuration file not found')
            with open(configfile) as f:
                for line in f:
                    for comment in (';', '#'):
                        if comment in line:
                            line = line[:line.find(comment)]
                    if line.count('=') == 1:
                        key, value = line.split('=')
                        values[key.strip().lower()] = value.strip()

        savepath = values.pop('savepath',
                              os.environ.get(_ENV_SAVEPATH,
                                             os.path.expanduser('~/nexoclom_tpu_output')))
        precision = values.pop('precision', 'float32')
        if precision not in ('float32', 'float64'):
            raise ConfigfileError(configfile or '<defaults>',
                                  f'precision must be float32 or float64, got {precision}')
        return cls(savepath=savepath, precision=precision, extras=values)

    def ensure_savepath(self) -> str:
        os.makedirs(self.savepath, exist_ok=True)
        return self.savepath


_config: NexoclomConfig | None = None


def get_config(reload: bool = False) -> NexoclomConfig:
    """Return the lazily-loaded machine configuration singleton."""
    global _config
    if _config is None or reload:
        _config = NexoclomConfig.load()
    return _config


def set_config(config: NexoclomConfig) -> None:
    """Install a configuration explicitly (used by tests for hermetic runs)."""
    global _config
    _config = config
