"""Jittable raster primitives: the TPU-native replacement for the reference's
OpenCL kernels (GaussianBlur, PitFillAlgorithm), OpenCV morphology calls, and
CPU ImageOperations loops. All functions are pure, shape-static, and safe
under jax.jit / jax.vmap.
"""

from .blur import gaussian_blur, strip_kernel
from .masks import (
    scl_mask,
    SCL,
    cover_percentage,
    cover_count,
    normalize,
    threshold,
)
from .morphology import ellipse_kernel, dilate, erode, close, cv_gaussian_blur
from .pitfill import pit_fill
from .components import connected_components, partition_regions, Region
from .stats import percentile, linear_step, trimmed_average, masked_percentile

__all__ = [
    "gaussian_blur",
    "strip_kernel",
    "scl_mask",
    "SCL",
    "cover_percentage",
    "cover_count",
    "normalize",
    "threshold",
    "ellipse_kernel",
    "dilate",
    "erode",
    "close",
    "cv_gaussian_blur",
    "pit_fill",
    "connected_components",
    "partition_regions",
    "Region",
    "percentile",
    "linear_step",
    "trimmed_average",
    "masked_percentile",
]
from . import geometry, image
from .pallas_kernels import fused_jacobi_tpu, pallas_available

__all__ += ["geometry", "image", "fused_jacobi_tpu", "pallas_available"]
