from nexoclom_tpu.atomicdata.atomicmass import atomicmass
from nexoclom_tpu.atomicdata.g_values import (gValue, RadPresConst,
                                              radpres_table, gvalue_table)
from nexoclom_tpu.atomicdata.photolossrates import PhotoRate

__all__ = ['atomicmass', 'gValue', 'RadPresConst', 'radpres_table',
           'gvalue_table', 'PhotoRate']
