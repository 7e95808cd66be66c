"""CSFD/DCSFD number core — TPU-native dual & hyper-dual arithmetic.

Replaces the reference's DeviceArray layer (X-SLAM
``DeviceArray/include/cuda_complex.hpp``, ``cuda_double_complex.hpp``,
``DoubleComplex.{h,cpp}``) with exact dual-number pytrees. See
:mod:`xslam_tpu.csfd.single` for the design rationale.
"""

from . import double, rawcomplex, single, vec3
from .double import DCSFD
from .single import CSFD

__all__ = ["CSFD", "DCSFD", "single", "double", "vec3", "rawcomplex"]
