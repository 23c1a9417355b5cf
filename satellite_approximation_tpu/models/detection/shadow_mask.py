"""Potential (candidate) shadow mask from pit-filled NIR darkness.

Rebuild of lib/cloud_shadow_detection/source/PotentialShadowMask.cpp:21-51:
pick a clear-sky NIR reference level (percentile chosen by cloud cover via a
linear ramp), flood every NIR pit up to that level, and flag pixels whose
fill depth exceeds 0.02 — OR'd with SCL shadow/dark classes, blurred, and
cut away from clouds.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...config import ShadowMaskConfig, BIG_SCENE_PIXELS
from ...ops.blur import gaussian_blur
from ...ops.masks import scl_mask, SCL, cover_percentage, fetch_mask
from ...ops.pitfill import pit_fill


@dataclasses.dataclass
class PotentialShadowMaskResult:
    mask: np.ndarray
    difference_of_pitfill_nir: np.ndarray
    pitfill_result: np.ndarray


def _psm_pre(nir, cloud_mask, scl, config: ShadowMaskConfig):
    """(outside_value, scl_shadow_dark) — everything before the pit fill."""
    scl_shadow_dark = scl_mask(scl, (SCL.CLOUD_SHADOWS, SCL.DARK_AREA_PIXELS))
    scl_shadow_dark_water = scl_mask(
        scl, (SCL.CLOUD_SHADOWS, SCL.DARK_AREA_PIXELS, SCL.WATER)
    )

    # The reference's partitionUnobscuredObscured collects NIR values where
    # the combined mask is TRUE (ImageOperations.h; PotentialShadowMask.cpp:29-31)
    # — faithfully reproduced, surprising as the selector reads.
    selector = cloud_mask | scl_shadow_dark_water
    cloud_cover = cover_percentage(cloud_mask)
    percent = jnp.clip(
        config.percentile_lo
        + (cloud_cover - config.cloud_cover_lo)
        * (config.percentile_hi - config.percentile_lo)
        / (config.cloud_cover_hi - config.cloud_cover_lo),
        config.percentile_lo,
        config.percentile_hi,
    )  # linearStep((.07,.4)->(.2,.7)) (PotentialShadowMask.cpp:32-34)
    outside_value = _dynamic_percentile(nir, selector, percent)
    return outside_value, scl_shadow_dark


def _psm_post(nir, pitfilled, scl_shadow_dark, cloud_mask, config: ShadowMaskConfig):
    """(mask, difference) — everything after the pit fill."""
    difference = pitfilled - nir
    prelim = difference >= config.nir_difference_threshold
    blurred = gaussian_blur((prelim | scl_shadow_dark).astype(jnp.float32), config.blur_sigma)
    mask = (blurred >= config.blur_threshold) & (~cloud_mask)
    return mask, difference


@functools.partial(jax.jit, static_argnames=("config",))
def _potential_shadow_kernel(nir, cloud_mask, scl, config: ShadowMaskConfig):
    outside_value, scl_shadow_dark = _psm_pre(nir, cloud_mask, scl, config)
    pitfilled = pit_fill(nir, outside_value)
    mask, difference = _psm_post(nir, pitfilled, scl_shadow_dark, cloud_mask, config)
    return mask, difference, pitfilled


_psm_pre_jit = functools.partial(jax.jit, static_argnames=("config",))(_psm_pre)
_psm_post_jit = functools.partial(jax.jit, static_argnames=("config",))(_psm_post)


def _dynamic_percentile(values, mask, percent):
    """masked_percentile with a traced percent (same semantics as
    Functions.cpp:29-35).

    The k-th order statistic is selected by BISECTION OVER THE f32 BIT
    SPACE instead of a sort: for non-negative floats the IEEE bit pattern
    is order-isomorphic to the value, so 32 masked count-reductions find
    the smallest attained value v with count(values <= v) >= k — exactly
    the sorted selection, for any f32 data. A monolithic jnp.sort of a
    full-tile raster (120M elements) crashes the TPU worker and is
    O(n log n) work besides; this is 32 fused VPU passes and O(1) memory."""
    from jax import lax

    # The bit-space bisection below is order-isomorphic only for
    # NON-NEGATIVE finite floats (negative IEEE bit patterns sort above
    # positives as int32, and lo starts at +0.0). Clamp so a future caller
    # with signed data degrades to "percentile of max(x, 0)" instead of a
    # silently wrong selection; NIR/probability inputs are >= 0 already.
    flat = jnp.maximum(values.ravel().astype(jnp.float32), jnp.float32(0.0))
    valid = mask.ravel()
    count = jnp.sum(valid.astype(jnp.int32))
    x = (percent.astype(jnp.float32) * count.astype(jnp.float32)).astype(jnp.int32)
    k = jnp.maximum(x, 1)

    bits = lax.bitcast_convert_type(flat, jnp.int32)

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum(((bits <= mid) & valid).astype(jnp.int32))
        take_left = cnt >= k
        return jnp.where(take_left, lo, mid + 1), jnp.where(take_left, mid, hi)

    lo, hi = lax.fori_loop(
        0, 32, body, (jnp.int32(0), jnp.int32(0x7F800000))
    )
    value = lax.bitcast_convert_type(lo, jnp.float32)
    value = jnp.where(x < 1, jnp.float32(0.0), value)
    value = jnp.where(x > count, jnp.float32(1.0), value)
    return value


def _scl_in_host(scl: np.ndarray, values) -> np.ndarray:
    out = np.zeros(scl.shape, bool)
    for v in values:
        out |= scl == int(v)
    return out


def _generate_host_native(nir, cloud_mask, scl, config) -> "PotentialShadowMaskResult | None":
    """Pure-host variant of the stage, pit fill via the native
    priority-flood (exact O(n log n)); None when the native lib is absent.
    Same formulas/summation order as the device kernel, with one caveat:
    past 2^24 pixels the device's f32 cover-percentage accumulation is
    inexact while the host's integer count is exact, so the percentile
    rank can differ by a few positions between the two paths at full-tile
    scale (the host value is the more accurate one). Used for full-tile
    rasters on hosts whose accelerator link makes raster transfers the
    bottleneck (~30-60 s per crossing here, measured)."""
    from ...native import pit_fill_flood
    from ...ops.blur import gaussian_blur_host

    nir = np.asarray(nir, np.float32)
    cloud_mask = np.asarray(cloud_mask, bool)
    scl = np.asarray(scl)
    scl_shadow_dark = _scl_in_host(scl, (SCL.CLOUD_SHADOWS, SCL.DARK_AREA_PIXELS))
    selector = cloud_mask | _scl_in_host(
        scl, (SCL.CLOUD_SHADOWS, SCL.DARK_AREA_PIXELS, SCL.WATER)
    )
    cloud_cover = np.float32(cloud_mask.sum()) / np.float32(cloud_mask.size)
    percent = float(
        np.clip(
            np.float32(config.percentile_lo)
            + (cloud_cover - np.float32(config.cloud_cover_lo))
            * np.float32(config.percentile_hi - config.percentile_lo)
            / np.float32(config.cloud_cover_hi - config.cloud_cover_lo),
            np.float32(config.percentile_lo),
            np.float32(config.percentile_hi),
        )
    )
    count = int(selector.sum())
    x = int(np.float32(percent) * np.float32(count))
    if x < 1:
        outside = np.float32(0.0)
    elif x > count:
        outside = np.float32(1.0)
    else:
        vals = nir[selector]
        outside = np.partition(vals, x - 1)[x - 1]  # exact k-th smallest

    pitfilled = pit_fill_flood(nir, float(outside))
    if pitfilled is None:
        return None
    difference = pitfilled - nir
    prelim = difference >= np.float32(config.nir_difference_threshold)
    blurred = gaussian_blur_host((prelim | scl_shadow_dark).astype(np.float32), config.blur_sigma)
    mask = (blurred >= np.float32(config.blur_threshold)) & (~cloud_mask)
    return PotentialShadowMaskResult(
        mask=mask, difference_of_pitfill_nir=difference, pitfill_result=pitfilled
    )


def generate_potential_shadow_mask(
    nir: np.ndarray,
    cloud_mask: np.ndarray,
    scl: np.ndarray,
    config: ShadowMaskConfig = ShadowMaskConfig(),
    device_output: bool = False,
) -> PotentialShadowMaskResult:
    """Full candidate-shadow stage (PotentialShadowMask.cpp:21-51).

    Small scenes run as ONE fused program. Full-tile-class rasters: when
    ``nir`` is a HOST array and the native library is available, the whole
    stage runs on the host (priority-flood pit fill — raster transfers to
    a tunneled accelerator cost more than the compute); otherwise it stages
    pre / pit-fill / post as separate device programs with the pit fill
    host-orchestrated in sweep-budgeted chunks (the tunneled-TPU runtime
    kills any single program running ~60 s). Identical semantics all ways."""
    from ...ops.pitfill import pit_fill_host

    if isinstance(nir, np.ndarray) and nir.size >= BIG_SCENE_PIXELS:
        host = _generate_host_native(nir, cloud_mask, scl, config)
        if host is not None:
            return host

    nir_j = jnp.asarray(nir, jnp.float32)
    cloud_j = jnp.asarray(cloud_mask, bool)
    scl_j = jnp.asarray(scl)
    if nir_j.size >= BIG_SCENE_PIXELS:
        outside_value, scl_shadow_dark = _psm_pre_jit(nir_j, cloud_j, scl_j, config)
        pitfilled = pit_fill_host(nir_j, outside_value)
        mask, diff = _psm_post_jit(nir_j, pitfilled, scl_shadow_dark, cloud_j, config)
        # only the mask is needed on the host (partition/matching); the f32
        # rasters stay device-resident — fetching them is ~1 GB of D2H on a
        # tunneled host, and the device refinement path consumes them in HBM
        # (np.asarray triggers the fetch lazily if a host consumer needs one)
        return PotentialShadowMaskResult(
            mask=mask if device_output else fetch_mask(mask),
            difference_of_pitfill_nir=diff,
            pitfill_result=pitfilled,
        )
    mask, diff, pitfilled = _potential_shadow_kernel(nir_j, cloud_j, scl_j, config)
    if device_output:
        return PotentialShadowMaskResult(
            mask=mask, difference_of_pitfill_nir=diff, pitfill_result=pitfilled
        )
    return PotentialShadowMaskResult(
        mask=fetch_mask(mask),
        difference_of_pitfill_nir=np.asarray(diff),
        pitfill_result=np.asarray(pitfilled),
    )
