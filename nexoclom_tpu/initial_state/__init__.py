from nexoclom_tpu.initial_state.sections import (AngularDist, Forces,
                                                 Geometry, Options,
                                                 SpatialDist, SpeedDist,
                                                 SurfaceInteraction)
from nexoclom_tpu.initial_state.input_class import Input, parse_input_file
from nexoclom_tpu.initial_state.sourcemap import SourceMap
from nexoclom_tpu.initial_state.loss_info import LossInfo
from nexoclom_tpu.initial_state.surface_temperature import surface_temperature

__all__ = ['Geometry', 'SurfaceInteraction', 'Forces', 'SpatialDist',
           'SpeedDist', 'AngularDist', 'Options', 'Input', 'parse_input_file',
           'SourceMap', 'LossInfo', 'surface_temperature']
