"""Separable Gaussian blur with the reference's exact kernel and boundary.

TPU-native replacement for the OpenCL kernel in
lib/cloud_shadow_detection/source/GaussianBlur.cpp:26-110:

* kernel radius R = int(2*sigma); taps w[i] = exp(-i^2/(2 sigma^2)) / (sqrt(2 pi) sigma),
  normalized so w0 + 2*sum(w[1:]) == 1 (GaussianBlur.cpp:95-110);
* horizontal pass then vertical pass (GaussianBlur.cpp:133-160);
* boundary: index v reflects as ``-v`` below 0 (mirror about pixel center 0)
  and ``2*end - v - 1`` at/above ``end`` (symmetric including the edge pixel)
  — note the two sides use *different* reflection conventions
  (GaussianBlur.cpp:27-29); we reproduce both exactly via asymmetric padding.

Implemented as a weighted sum of statically shifted slices — XLA fuses the
whole stencil into one VPU loop, no gathers, no convolution lowering needed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def strip_kernel(sigma: float) -> np.ndarray:
    """1-D half-kernel [w0, w1, ..., wR], matching GaussianBlur.cpp:95-110."""
    size = int(2.0 * sigma) + 1
    k = np.zeros(size, dtype=np.float32)
    norm = np.float32(1.0) / (np.sqrt(np.float32(2.0) * np.float32(np.pi)) * np.float32(sigma))
    rcoeff = np.float32(1.0) / (np.float32(2.0) * np.float32(sigma) * np.float32(sigma))
    total = np.float32(0.0)
    for i in range(size):
        v = norm * np.exp(np.float32(-i * i) * rcoeff, dtype=np.float32)
        k[i] = v if sigma > 1e-6 else np.float32(i == 0)
        total += np.float32(2.0) * k[i] if i > 0 else k[i]
    k *= np.float32(1.0) / total
    return k


def _pad_reflect_asym(xp, x, radius: int, axis: int):
    """Pad: leading side mirrors about pixel 0 excluding the edge (``-v``),
    trailing side symmetric including the edge (``2*end-v-1``).
    ``xp`` is the array namespace (numpy or jax.numpy) — the host and
    device blurs share this code so their boundary handling and summation
    order can never drift apart."""
    pad_lead = [(0, 0)] * x.ndim
    pad_lead[axis] = (radius, 0)
    pad_trail = [(0, 0)] * x.ndim
    pad_trail[axis] = (0, radius)
    x = xp.pad(x, pad_lead, mode="reflect")
    return xp.pad(x, pad_trail, mode="symmetric")


def _blur_axis(x, kernel: np.ndarray, axis: int, xp=jnp):
    radius = len(kernel) - 1
    if radius == 0:
        return x * float(kernel[0])
    n = x.shape[axis]
    padded = _pad_reflect_asym(xp, x, radius, axis)

    def take(offset):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(radius + offset, radius + offset + n)
        return padded[tuple(idx)]

    # out = w0*x + sum_i w_i*(x[+i] + x[-i]) — mirrors the OpenCL loop
    # (GaussianBlur.cpp:43-50) including its summation order.
    out = float(kernel[0]) * take(0)
    for i in range(1, radius + 1):
        out = out + float(kernel[i]) * (take(i) + take(-i))
    return out


@functools.partial(jax.jit, static_argnames=("sigma",))
def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (..., H, W) float image.

    Matches GaussianBlur::GaussianBlurFilter (GaussianBlur.cpp:113-160):
    horizontal (last axis) pass feeding the vertical (-2 axis) pass.
    Batch axes vectorize for free.
    """
    kernel = strip_kernel(float(sigma))
    x = image.astype(jnp.float32)
    x = _blur_axis(x, kernel, axis=x.ndim - 1)
    x = _blur_axis(x, kernel, axis=x.ndim - 2)
    return x


def gaussian_blur_host(image: np.ndarray, sigma: float) -> np.ndarray:
    """Numpy twin of :func:`gaussian_blur` — literally the SAME
    ``_blur_axis`` code run with the numpy namespace, so kernel, boundary
    and summation order cannot drift from the device blur. For
    host-resident pipelines: full-tile-class rasters stay off the wire on
    hosts with slow accelerator links."""
    kernel = strip_kernel(float(sigma))
    x = np.asarray(image, np.float32)
    x = _blur_axis(x, kernel, x.ndim - 1, xp=np)
    return _blur_axis(x, kernel, x.ndim - 2, xp=np)
