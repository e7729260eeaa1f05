from nexoclom_tpu.utilities.exceptions import InputError, ConfigfileError
from nexoclom_tpu.utilities.config import NexoclomConfig, get_config, set_config
from nexoclom_tpu.utilities.catalog import Catalog, get_catalog
from nexoclom_tpu.utilities.sweep import run_sweep
from nexoclom_tpu.utilities.tracing import (setup_logging, StepRateTimer,
                                            trace, device_barrier)

__all__ = ['InputError', 'ConfigfileError', 'NexoclomConfig', 'get_config',
           'set_config', 'Catalog', 'get_catalog', 'run_sweep',
           'setup_logging', 'StepRateTimer', 'trace', 'device_barrier']
