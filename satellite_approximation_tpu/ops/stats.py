"""Scalar statistics matching the reference's Functions.cpp semantics."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_step(x: float, p0: tuple[float, float], p1: tuple[float, float]) -> float:
    """Piecewise-linear ramp between two points (Functions.cpp:17-27)."""
    (x0, y0), (x1, y1) = p0, p1
    if x0 > x1:
        (x0, y0), (x1, y1) = (x1, y1), (x0, y0)
    if x < x0:
        return y0
    if x > x1:
        return y1
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def percentile(values: np.ndarray, percent: float) -> float:
    """The reference's idiosyncratic percentile (Functions.cpp:29-35):
    sort, take element ``int(percent*n) - 1``; returns 0.0 when the index
    underflows and 1.0 when it overflows."""
    values = np.sort(np.asarray(values).ravel())
    n = values.size
    x = int(np.float32(percent) * np.float32(n))
    if x < 1:
        return 0.0
    if x > n:
        return 1.0
    return float(values[x - 1])


def masked_percentile(values: jnp.ndarray, mask: jnp.ndarray, percent: float) -> jnp.ndarray:
    """Static-shape, jittable version of :func:`percentile` over ``values[mask]``.

    Sorts the full array with masked-out entries pushed to +inf, then indexes
    element ``int(percent * count) - 1`` — identical semantics to the
    reference's partitionUnobscuredObscured + percentile pipeline
    (ImageOperations.h partitionUnobscuredObscured; Functions.cpp:29-35).
    """
    flat = jnp.where(mask.ravel(), values.ravel(), jnp.inf).astype(jnp.float32)
    ordered = jnp.sort(flat)
    count = jnp.sum(mask.astype(jnp.int32))
    x = (jnp.float32(percent) * count.astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.clip(x - 1, 0, flat.size - 1)
    value = ordered[idx]
    value = jnp.where(x < 1, jnp.float32(0.0), value)
    value = jnp.where(x > count, jnp.float32(1.0), value)
    return value


def trimmed_average(values: np.ndarray, lo: float, hi: float) -> float:
    """Mean of the sorted slice [floor(lo*n), ceil(hi*n)] inclusive
    (Functions.cpp:212-230). NaN on empty input or inverted indices."""
    values = np.asarray(values, dtype=np.float32).ravel()
    n = values.size
    if n == 0:
        return float("nan")
    min_index = max(int(np.floor(lo * float(n))), 0)
    max_index = min(int(np.ceil(hi * float(n))), n - 1)
    if min_index > max_index:
        return float("nan")
    ordered = np.sort(values)
    return float(np.float32(ordered[min_index : max_index + 1].sum(dtype=np.float32)) / np.float32(max_index - min_index + 1))
