from nexoclom_tpu.particle_tracking.output import Output

__all__ = ['Output']
