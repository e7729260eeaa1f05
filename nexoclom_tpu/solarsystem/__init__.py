from nexoclom_tpu.solarsystem.ssobject import SSObject
from nexoclom_tpu.solarsystem.kepler import planet_dist, true_anomaly_from_mean

__all__ = ['SSObject', 'planet_dist', 'true_anomaly_from_mean']
