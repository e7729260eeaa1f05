from nexoclom_tpu.particle_tracking.output import Output
from nexoclom_tpu.particle_tracking.fused import FusedImage, fused_image_run
from nexoclom_tpu.particle_tracking.idl_import import IDLout

__all__ = ['Output', 'FusedImage', 'fused_image_run', 'IDLout']
