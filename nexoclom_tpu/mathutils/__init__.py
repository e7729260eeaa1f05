from nexoclom_tpu.mathutils.histograms import Histogram, Histogram2d
from nexoclom_tpu.mathutils.rotation import rotation_matrix
from nexoclom_tpu.mathutils.distributions import (sputdist, MaxwellianDist,
                                                  CumDist)
from nexoclom_tpu.mathutils.randomdeviates import (random_deviates_1d,
                                                   random_deviates_2d)
from nexoclom_tpu.mathutils.smoothing import smooth, smooth2d
from nexoclom_tpu.mathutils.misc import minmaxmean

__all__ = ['Histogram', 'Histogram2d', 'rotation_matrix', 'sputdist',
           'MaxwellianDist', 'CumDist', 'random_deviates_1d',
           'random_deviates_2d', 'smooth', 'smooth2d', 'minmaxmean']
