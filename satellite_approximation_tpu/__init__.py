"""satellite_approximation_tpu — TPU-native (JAX/XLA/Pallas) framework for
finding and filling missing data in optical satellite imagery.

A ground-up, TPU-first rebuild of the capabilities of the
``ebiederstadt/satellite-approximation`` C++/OpenCL reference:

* ``models.laplace`` / ``models.poisson`` — Laplace/Poisson inpainting as
  matrix-free masked stencil solves (CG + multigrid) instead of Eigen sparse
  assembly (reference: lib/approx/source/{laplace,poisson}.cpp).
* ``models.detection`` — Sentinel-2 cloud & cloud-shadow detection via
  ray casting with probability-analysis refinement, fully vectorized
  (reference: lib/cloud_shadow_detection/).
* ``ops`` — jittable raster primitives (separable Gaussian blur, morphology,
  pit-fill fixpoint, connected components, histograms) replacing the
  reference's OpenCL kernels and OpenCV calls.
* ``parallel`` — multi-chip spatial sharding over ``jax.sharding.Mesh`` with
  halo exchange (the reference is single-device; this is new capability).
* ``utils`` — GeoTIFF IO with template-copy semantics, SQLite status DB,
  date/folder conventions, logging (reference: lib/utils/).

Public API mirrors the reference's pybind11 surface (reference src/main.cpp:16-59).
"""

import os as _os

import jax as _jax

# f64 on-device: the iterative-refinement outer loops compute true residuals
# in f64 on the accelerator (a handful of emulated-f64 sweeps) instead of
# shipping hundreds of MB to the host per pass. All kernels pick their
# dtypes explicitly, so enabling x64 does not change compute-path precision.
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the detection pipeline's big fused
# programs take minutes to compile on TPU; caching them on disk makes every
# process after the first start warm (the reference JIT-compiles its OpenCL
# kernels per process, ComputeEnvironment.cpp/GaussianBlur.cpp init()).
# Override the location with SATAPPROX_CACHE_DIR; disable with
# SATAPPROX_CACHE_DIR="".
_cache_dir = _os.environ.get(
    "SATAPPROX_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "satellite_approximation_tpu"),
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .utils.log import LogLevel, set_log_level, log_location
from .models.laplace import (
    filling_missing_portions_smooth_boundaries,
    fill_missing_portion_smooth_boundary,
    apply_laplace,
    fill_missing_data_folder,
    find_connected_components,
)
from .models.poisson import blend_images_poisson, highlight_area_replaced, PerfInfo
from .models.closest import find_good_close_image
from .models.detection.pipeline import (
    CloudParams,
    SkipShadowDetection,
    Status,
    detect,
    detect_clouds,
    detect_single_folder,
    detect_in_folder,
    get_diagonal_distance,
)
from .indices import Indices, required_files, missing_files, compute_index

__version__ = "0.1.0"

__all__ = [
    "LogLevel",
    "set_log_level",
    "log_location",
    "filling_missing_portions_smooth_boundaries",
    "fill_missing_portion_smooth_boundary",
    "apply_laplace",
    "fill_missing_data_folder",
    "find_connected_components",
    "blend_images_poisson",
    "highlight_area_replaced",
    "PerfInfo",
    "find_good_close_image",
    "CloudParams",
    "SkipShadowDetection",
    "Status",
    "detect",
    "detect_clouds",
    "detect_single_folder",
    "detect_in_folder",
    "get_diagonal_distance",
    "Indices",
    "required_files",
    "missing_files",
    "compute_index",
]
