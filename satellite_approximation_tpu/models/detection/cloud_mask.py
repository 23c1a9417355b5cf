"""Cloud mask generation + partitioning into cloud objects.

Rebuild of lib/cloud_shadow_detection/source/CloudMask.cpp. The OpenCL blur,
OpenCV morphology (ellipse dilate r=15, close r=5, 11x11 Gaussian) and CPU
flood fill become one fused jittable pipeline + a log-depth connected
components pass (ops/components.py).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...config import CloudMaskConfig
from ...ops.blur import gaussian_blur
from ...ops.masks import scl_mask, SCL, fetch_mask
from ...ops.morphology import dilate, close, cv_gaussian_blur
from ...ops.components import partition_regions, Region
from ...ops import geometry


@dataclasses.dataclass
class GeneratedCloudMask:
    """Outputs of cloud-mask generation (CloudMask.h GeneratedCloudMask)."""

    cloud_mask: np.ndarray  # processed (dilated/closed/blurred) mask
    cloud_mask_no_processing: np.ndarray  # raw threshold mask
    blended_cloud_probability: np.ndarray  # sigma=4 blurred CLP


@functools.partial(jax.jit, static_argnames=("config",))
def _cloud_mask_kernel(clp, cld, scl, config: CloudMaskConfig):
    blended = gaussian_blur(clp, config.clp_blur_sigma)
    mask = (blended >= config.clp_threshold) & (cld >= config.cld_threshold)
    mask = mask | scl_mask(scl, (SCL.CLOUD_MEDIUM, SCL.CLOUD_HIGH))
    # image-processing cleanup (CloudMask.cpp:42-58): dilate to catch
    # boundary clouds the SCL misses, close to fill holes, blur the edges.
    processed = dilate(mask, config.dilation_radius)
    processed = close(processed, config.close_radius)
    blurred = cv_gaussian_blur(processed.astype(jnp.float32), config.cleanup_blur_ksize)
    # OpenCV blurs the u8 0/1 image and rounds back to u8 (round-half-even);
    # any nonzero rounded value is true.
    processed = jnp.round(blurred) > 0
    return mask, processed, blended


def generate_cloud_mask_ignore_low_probability(
    clp: np.ndarray, cld: np.ndarray, scl: np.ndarray,
    config: CloudMaskConfig = CloudMaskConfig(),
    device_output: bool = False,
) -> GeneratedCloudMask:
    """The variant ``detect`` uses (CloudMask.cpp:30-61): threshold blurred
    CLP & CLD, OR with SCL medium/high cloud classes, then morphological
    cleanup. Returns both the processed and the raw mask.

    ``device_output`` keeps all three rasters on device (the all-device
    pipeline route: downstream stages consume them in-place and only
    bit-packed masks ever cross back). Otherwise masks come home through
    the packed fetch (1 bit/px over the link instead of 8)."""
    mask, processed, blended = _cloud_mask_kernel(
        jnp.asarray(clp, jnp.float32), jnp.asarray(cld, jnp.float32), jnp.asarray(scl), config
    )
    if device_output:
        return GeneratedCloudMask(
            cloud_mask=processed,
            cloud_mask_no_processing=mask,
            blended_cloud_probability=blended,
        )
    return GeneratedCloudMask(
        cloud_mask=fetch_mask(processed),
        cloud_mask_no_processing=fetch_mask(mask),
        blended_cloud_probability=np.asarray(blended),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _cloud_mask_simple_kernel(clp, cld, scl, config: CloudMaskConfig):
    blended = gaussian_blur(clp, config.clp_blur_sigma)
    mask = (blended >= config.clp_threshold) & (cld >= config.cld_threshold)
    mask = mask | scl_mask(scl, (SCL.CLOUD_LOW, SCL.CLOUD_MEDIUM, SCL.CLOUD_HIGH))
    mask = gaussian_blur(mask.astype(jnp.float32), config.post_blur_sigma) >= config.post_blur_threshold
    return mask, blended


def generate_cloud_mask(
    clp: np.ndarray, cld: np.ndarray, scl: np.ndarray,
    config: CloudMaskConfig = CloudMaskConfig(),
) -> GeneratedCloudMask:
    """The low-probability-inclusive variant (CloudMask.cpp:17-28)."""
    mask, blended = _cloud_mask_simple_kernel(
        jnp.asarray(clp, jnp.float32), jnp.asarray(cld, jnp.float32), jnp.asarray(scl), config
    )
    mask = np.asarray(mask)
    return GeneratedCloudMask(
        cloud_mask=mask,
        cloud_mask_no_processing=mask.copy(),
        blended_cloud_probability=np.asarray(blended),
    )


@dataclasses.dataclass
class CloudObject:
    """One cloud: compact id, pixel bbox, area, world-space quad
    (CloudMask.cpp:78-103; quad corner offsets .1/.9)."""

    id: int
    region: Region
    quad: geometry.Quad
    # bbox in the reference's (x, y-from-bottom) coordinates
    min_x: int
    max_x: int
    min_y: int
    max_y: int


def partition_cloud_mask(
    cloud_mask: np.ndarray, diagonal_length: float, min_cloud_area: int
) -> tuple[np.ndarray, list[CloudObject]]:
    """Partition the mask into cloud objects with world-space quads
    (CloudMask.cpp:63-108). Returns (id_map, clouds); id_map holds the
    compact cloud id per pixel (-1 elsewhere), ids in the reference's
    bottom-left column-major discovery order."""
    # device masks come home bit-packed; the flood itself is host-side
    # (pointer-chasing BFS — vectorized label propagation exists in
    # ops/components but loses to the native flood at every size measured)
    mask = fetch_mask(cloud_mask)
    h, w = mask.shape
    id_map, regions = partition_regions(mask, min_area=min_cloud_area, connectivity=8)

    clouds = []
    for r in regions:
        min_x, max_x = r.col_min, r.col_max
        min_y, max_y = h - 1 - r.row_max, h - 1 - r.row_min
        quad = geometry.Quad(
            p00=geometry.pixel_to_world((h, w), diagonal_length, min_x, min_y, 0.1, 0.1),
            p01=geometry.pixel_to_world((h, w), diagonal_length, max_x, min_y, 0.9, 0.1),
            p10=geometry.pixel_to_world((h, w), diagonal_length, max_x, max_y, 0.9, 0.9),
            p11=geometry.pixel_to_world((h, w), diagonal_length, min_x, max_y, 0.1, 0.9),
        )
        clouds.append(
            CloudObject(
                id=r.id, region=r, quad=quad,
                min_x=min_x, max_x=max_x, min_y=min_y, max_y=max_y,
            )
        )
    return id_map, clouds
