"""Binary morphology on the MXU: dilate/erode/close with elliptical
structuring elements, plus OpenCV-compatible Gaussian smoothing.

Replaces the OpenCV calls in the reference's cloud-mask cleanup
(lib/cloud_shadow_detection/source/CloudMask.cpp:42-58): dilate with an
ellipse of radius 15, morphological close with radius 5, then an 11x11
Gaussian blur. Binary dilation/erosion are expressed as 0/1 convolutions
(exact in f32 — counts are small integers) which XLA lowers onto the MXU;
this beats gather-based approaches by a wide margin on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _cv_round(x: np.ndarray | float):
    """OpenCV cvRound: round half to even (banker's rounding)."""
    return np.rint(x).astype(np.int64)


def ellipse_kernel(radius: int) -> np.ndarray:
    """OpenCV ``getStructuringElement(MORPH_ELLIPSE, (2r+1, 2r+1))`` replica.

    Follows OpenCV's row-wise chord computation, including its
    round-half-to-even ``saturate_cast<int>`` — validated bit-exact against
    cv2 in tests. Used by the reference at CloudMask.cpp:47-53.
    """
    ksize = 2 * radius + 1
    r = c = radius
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    elem = np.zeros((ksize, ksize), dtype=np.uint8)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = int(_cv_round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, ksize)
            elem[i, j1:j2] = 1
    return elem


def _kernel_chords(kernel: np.ndarray) -> list[tuple[int, int, int]] | None:
    """(dy, j1, j2) per kernel row when every row's set pixels form one
    contiguous chord (true for OpenCV ellipses); None otherwise."""
    kh, kw = kernel.shape
    r_y, r_x = kh // 2, kw // 2
    chords = []
    for i in range(kh):
        cols = np.nonzero(kernel[i])[0]
        if cols.size == 0:
            continue
        j1, j2 = int(cols[0]), int(cols[-1])
        if not np.all(kernel[i, j1 : j2 + 1]):
            return None
        chords.append((i - r_y, j1 - r_x, j2 - r_x))
    return chords


def _count_conv(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """SAME-padded 0/1 convolution counting set pixels under the kernel.

    Chord-decomposed: one f32 row-cumsum, then two shifted slices per
    kernel row (the chord sum is a prefix-sum difference) — ~2*kh fused
    VPU adds instead of a kh*kw-tap convolution. Exact: all partial sums
    are small integers in f32. XLA's conv lowering OOMs at full-tile
    scale (10980^2: a ~62 GB broadcast-select buffer) and is slower even
    where it fits; non-chord kernels (none in practice) fall back to it."""
    squeeze = mask.ndim == 2
    x = mask.astype(jnp.float32)
    if squeeze:
        x = x[None]

    chords = _kernel_chords(kernel)
    if chords is None:
        k = jnp.asarray(kernel, dtype=jnp.float32)[None, None]
        out = lax.conv_general_dilated(
            x[:, None],
            k,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )[:, 0]
        return out[0] if squeeze else out

    kh, kw = kernel.shape
    r_y, r_x = kh // 2, kw // 2
    h, w = x.shape[-2], x.shape[-1]
    # rows pad r_y each side; cols pad r_x+1 left (room for the j1-1 prefix
    # index of a full-width chord) and r_x right — all zeros (SAME border)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r_y, r_y), (r_x + 1, r_x)])
    c = jnp.cumsum(xp, axis=-1)  # exact: row sums < 2^24
    out = jnp.zeros_like(x)
    for dy, j1, j2 in chords:
        row = [slice(None)] * x.ndim
        row[-2] = slice(r_y + dy, r_y + dy + h)
        hi = [slice(None)] * x.ndim
        hi[-1] = slice(r_x + 1 + j2, r_x + 1 + j2 + w)
        lo = [slice(None)] * x.ndim
        lo[-1] = slice(r_x + j1, r_x + j1 + w)  # index (j1-1)+1 in padded space
        cr = c[tuple(row)]
        out = out + (cr[tuple(hi)] - cr[tuple(lo)])
    return out[0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("radius",))
def dilate(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary dilation by an elliptical SE. Out-of-image treated as background
    (OpenCV constant-border default for dilate)."""
    return _count_conv(mask, ellipse_kernel(radius)) > 0.5


@functools.partial(jax.jit, static_argnames=("radius",))
def erode(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary erosion by an elliptical SE; out-of-image treated as foreground
    (OpenCV constant-border default for erode). erode(m) == ~dilate(~m)."""
    return ~(_count_conv(~mask, ellipse_kernel(radius)) > 0.5)


@functools.partial(jax.jit, static_argnames=("radius",))
def close(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Morphological close = erode(dilate(mask)) (cv::MORPH_CLOSE)."""
    return erode(dilate(mask, radius), radius)


def cv_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """OpenCV ``getGaussianKernel``: when sigma<=0 it derives
    sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8 (e.g. ksize=11 -> sigma=2.0)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float64)


@functools.partial(jax.jit, static_argnames=("ksize", "sigma"))
def cv_gaussian_blur(image: jnp.ndarray, ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """Separable Gaussian blur matching cv::GaussianBlur's kernel and its
    default BORDER_REFLECT_101 boundary (numpy 'reflect'). Used by the
    reference's cloud-mask edge cleanup (CloudMask.cpp:56-58)."""
    kernel = cv_gaussian_kernel(ksize, sigma).astype(np.float32)
    radius = ksize // 2
    x = image.astype(jnp.float32)

    def blur_axis(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (radius, radius)
        p = jnp.pad(a, pad, mode="reflect")
        n = a.shape[axis]
        out = jnp.zeros_like(a)
        for i in range(ksize):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(i, i + n)
            out = out + float(kernel[i]) * p[tuple(idx)]
        return out

    x = blur_axis(x, x.ndim - 1)
    x = blur_axis(x, x.ndim - 2)
    return x
