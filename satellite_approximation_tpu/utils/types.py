"""Dtype aliases and small array statistics helpers.

Replaces the reference's lib/utils/include/utils/types.h (u8..f64 aliases,
Eigen matrix aliases) and lib/utils/include/utils/eigen.h
(percent_non_zero / count_non_zero / printable_stats).

Arrays in this framework are JAX/NumPy arrays in **top-left row-major**
(row, col) convention — the reference's bottom-left ``at/set`` convention
(lib/cloud_shadow_detection/ImageOperations.h:24-45) exists only for
OpenGL-era reasons and is dropped; geometry helpers embed the flip where
world coordinates are needed (see ops/geometry.py).
"""

from __future__ import annotations

import numpy as np

# dtype aliases (reference utils/types.h:10-22)
u8 = np.uint8
u16 = np.uint16
u32 = np.uint32
i32 = np.int32
i64 = np.int64
f32 = np.float32
f64 = np.float64


def count_non_zero(a) -> int:
    """Number of non-zero (true) entries. Reference utils/eigen.h:14-18."""
    return int(np.asarray(a).astype(bool).sum())


def percent_non_zero(a) -> float:
    """Fraction of non-zero entries in [0,1]. Reference utils/eigen.h:8-12.

    Device arrays reduce on device (one scalar crosses the link, not the
    raster); the i64 count is exact at any raster size."""
    if not isinstance(a, np.ndarray) and hasattr(a, "devices"):
        import jax.numpy as jnp

        if a.size == 0:
            return 0.0
        return float(jnp.sum(a.astype(bool).astype(jnp.int64)) / a.size)
    a = np.asarray(a)
    if a.size == 0:
        return 0.0
    return float(a.astype(bool).sum() / a.size)


def printable_stats(a) -> str:
    """Min/max/mean summary string. Reference utils/eigen.h:20-24."""
    a = np.asarray(a, dtype=np.float64)
    return f"min: {a.min():.6g}, max: {a.max():.6g}, mean: {a.mean():.6g}"
