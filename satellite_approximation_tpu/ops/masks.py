"""Mask & classification primitives.

Replaces the reference's elementwise CPU loops:
* Sentinel-2 Scene Classification Layer masks
  (lib/cloud_shadow_detection/source/SceneClassificationLayer.cpp:56-99),
* Threshold / NOT / AND / OR / normalize / CoverPercentage
  (lib/cloud_shadow_detection/source/ImageOperations.cpp:6-50,176-192).

All functions are jittable and vmappable.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class SCL(enum.IntEnum):
    """Sentinel-2 SCL class values (reference SceneClassificationLayer.h:5-17)."""

    NO_DATA = 0
    SATURATED_DEFECTIVE = 1
    DARK_AREA_PIXELS = 2
    CLOUD_SHADOWS = 3
    VEGETATION = 4
    BARE_SOIL = 5
    WATER = 6
    CLOUD_LOW = 7
    CLOUD_MEDIUM = 8
    CLOUD_HIGH = 9
    CLOUD_CIRRUS = 10
    SNOW_ICE = 11


# RGBA colours per class (reference SceneClassificationLayer.h:31-43), as
# 0xAABBGGRR words matching the reference's packing.
SCL_COLOURS = {
    SCL.NO_DATA: 0xFF000000,
    SCL.SATURATED_DEFECTIVE: 0xFF333333,
    SCL.DARK_AREA_PIXELS: 0xFF00FFFF,
    SCL.CLOUD_SHADOWS: 0xFFFF007F,
    SCL.VEGETATION: 0xFF00FF00,
    SCL.BARE_SOIL: 0xFF003300,
    SCL.WATER: 0xFFFF0000,
    SCL.CLOUD_LOW: 0xFF000033,
    SCL.CLOUD_MEDIUM: 0xFF00007F,
    SCL.CLOUD_HIGH: 0xFF0000FF,
    SCL.CLOUD_CIRRUS: 0xFF00FFFF,
    SCL.SNOW_ICE: 0xFFFFFF00,
}


def scl_mask(scl: jnp.ndarray, classes: tuple[SCL, ...] | frozenset[SCL]) -> jnp.ndarray:
    """Boolean mask of pixels whose SCL class is in ``classes``.

    Vectorized form of SceneClassificationLayer::GenerateMask
    (SceneClassificationLayer.cpp:56-99). ``classes`` must be static.
    """
    values = sorted(int(c) for c in classes)
    out = jnp.zeros(scl.shape, dtype=bool)
    for v in values:
        out = out | (scl == v)
    return out


def scl_rgba(scl: np.ndarray) -> np.ndarray:
    """Class → packed RGBA colour map (SceneClassificationLayer.cpp:101-144)."""
    scl = np.asarray(scl)
    out = np.full(scl.shape, SCL_COLOURS[SCL.NO_DATA], dtype=np.uint32)
    for cls, colour in SCL_COLOURS.items():
        if cls == SCL.NO_DATA:
            continue
        out[scl == int(cls)] = colour
    return out


def normalize(image: jnp.ndarray, max_value: float) -> jnp.ndarray:
    """Cast to f32 and divide by ``max_value`` (ImageOperations.h normalize)."""
    return image.astype(jnp.float32) / jnp.float32(max_value)


def threshold(image: jnp.ndarray, value) -> jnp.ndarray:
    """``image >= value`` (ImageOperations.cpp:6-27)."""
    return image >= value


def cover_count(mask: jnp.ndarray) -> jnp.ndarray:
    """Number of true pixels (ImageOperations.cpp:176)."""
    return jnp.sum(mask.astype(jnp.int32))


def cover_percentage(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of true pixels, f32 (ImageOperations.cpp:178-186)."""
    return jnp.sum(mask.astype(jnp.float32)) / jnp.float32(mask.size)


@jax.jit
def _pack_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a bool raster into bytes (big-endian bit order, numpy
    ``unpackbits`` convention), row-major. Shape must be (N8*8,) flat —
    :func:`fetch_mask` handles padding."""
    bits = mask.reshape(-1, 8).astype(jnp.uint8)
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    return jnp.sum(bits << shifts, axis=1, dtype=jnp.uint8)


def fetch_mask(mask) -> np.ndarray:
    """Fetch a device bool mask to the host as np.bool_, moving 1 BIT per
    pixel across the device link instead of a byte.

    On hosts where the accelerator sits behind a slow transport (PCIe at
    worst, a network tunnel here), raster D2H dominates mask-producing
    stages: a 10980^2 bool mask is 120 MB raw but 15 MB packed. Device-side
    packing is one fused VPU pass; numpy unpacks at memory speed. Host
    arrays pass through untouched.
    """
    if isinstance(mask, np.ndarray):
        return mask.astype(bool, copy=False)
    h_w = mask.shape
    flat_len = int(np.prod(h_w))
    pad = (-flat_len) % 8
    flat = mask.reshape((flat_len,))
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    packed = np.asarray(_pack_bits(flat))
    out = np.unpackbits(packed)[:flat_len].astype(bool)
    return out.reshape(h_w)


@partial(jax.jit, static_argnames=("shape",))
def _unpack_bits_device(packed: jnp.ndarray, shape: tuple[int, ...]) -> jnp.ndarray:
    """Unpack big-endian packed bytes back into a bool raster on device
    (inverse of :func:`_pack_bits`; one fused VPU pass)."""
    shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
    bits = (packed[:, None] >> shifts) & jnp.uint8(1)
    flat_len = int(np.prod(shape))
    return bits.reshape(-1)[:flat_len].astype(bool).reshape(shape)


def push_mask(mask: np.ndarray) -> jnp.ndarray:
    """Upload a host bool mask at 1 BIT per pixel (H2D mirror of
    :func:`fetch_mask`): numpy packs at memory speed, the 8x-smaller u8
    buffer crosses the link, one device pass unpacks. A 10980^2 bool mask
    is 120 MB raw vs 15 MB packed — multi-second H2D savings per solve on
    PCIe-or-worse transports. Device arrays pass through untouched."""
    if not isinstance(mask, np.ndarray):
        return jnp.asarray(mask, bool)
    shape = mask.shape
    packed = np.packbits(mask.reshape(-1))  # zero-pads the tail byte
    return _unpack_bits_device(jnp.asarray(packed), shape)
