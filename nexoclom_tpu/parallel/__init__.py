from nexoclom_tpu.parallel.mesh import (make_mesh, packet_sharding,
                                        ensemble_sharding, replicated,
                                        resolve_packet_mesh, shard_padded,
                                        shard_state)
from nexoclom_tpu.parallel.ensemble import (make_ensemble_step,
                                            stack_force_tables,
                                            species_sweep_tables,
                                            sample_uniform_flat_source)

__all__ = ['make_mesh', 'packet_sharding', 'ensemble_sharding', 'replicated',
           'resolve_packet_mesh', 'shard_padded', 'shard_state',
           'make_ensemble_step', 'stack_force_tables',
           'species_sweep_tables', 'sample_uniform_flat_source']
