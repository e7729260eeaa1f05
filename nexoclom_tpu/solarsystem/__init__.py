from nexoclom_tpu.solarsystem.ssobject import SSObject
from nexoclom_tpu.solarsystem.kepler import planet_dist, true_anomaly_from_mean
from nexoclom_tpu.solarsystem.planet_geometry import planet_geometry
from nexoclom_tpu.solarsystem.moon_ephemeris import (moon_phase_at_time,
                                                     register_moon_ephemeris)

__all__ = ['SSObject', 'planet_dist', 'true_anomaly_from_mean',
           'planet_geometry', 'moon_phase_at_time',
           'register_moon_ephemeris']
