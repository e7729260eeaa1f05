from nexoclom_tpu.data_simulation.model_result import ModelResult
from nexoclom_tpu.data_simulation.spacecraft_data import SpacecraftData
from nexoclom_tpu.data_simulation.los_result import LOSResult
from nexoclom_tpu.data_simulation.los_fitted import LOSResultFitted
from nexoclom_tpu.data_simulation.model_image import ModelImage
from nexoclom_tpu.data_simulation.model_density import ModelDensity
from nexoclom_tpu.data_simulation.compute_iteration import (
    IterationResult, IterationResultFitted, compute_iteration)
from nexoclom_tpu.data_simulation.make_source_map import (
    make_source_map, build_sourcemap_from_outputs)

__all__ = ['ModelResult', 'SpacecraftData', 'LOSResult', 'LOSResultFitted',
           'ModelImage', 'ModelDensity', 'IterationResult',
           'IterationResultFitted', 'compute_iteration', 'make_source_map',
           'build_sourcemap_from_outputs']
