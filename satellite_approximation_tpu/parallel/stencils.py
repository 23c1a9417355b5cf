"""Sharded detection stencils: multi-chip forms of the two reference GPU
kernels (SURVEY §2.5 P6/P8 applied to the detection pipeline).

* :func:`sharded_gaussian_blur` — the separable blur
  (ops/blur.gaussian_blur; reference GaussianBlur.cpp:26-160) with image
  rows sharded over the mesh's 'x' axis. The horizontal pass is purely
  local; the vertical pass exchanges a radius-deep ghost slab once
  (``ppermute`` over ICI) and repairs the global top/bottom shards' ghost
  rows to the reference's exact asymmetric-reflect boundary. Bit-identical
  to the single-device blur (tests/test_parallel.py).

* :func:`sharded_pit_fill` — the morphological pit-fill fixpoint
  (ops/pitfill; reference PitFillAlgorithm.cpp:28-154) with one ghost-row
  exchange per Jacobi sweep and a ``psum``-reduced global change flag —
  the multi-chip version of the reference's hasChanged loop. Same
  monotone-from-above fixpoint, so results are bit-identical to the
  single-device kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.blur import strip_kernel
from .halo import halo_pad_rows


def _vertical_blur_sharded(x, kernel: np.ndarray, axis_name: str):
    """Vertical pass of the strip blur on a row-sharded block, matching
    ops/blur._blur_axis bit-for-bit: same taps, same summation order, same
    asymmetric reflect (leading mirrors about pixel 0 excluding the edge,
    trailing includes it — GaussianBlur.cpp:27-29)."""
    radius = len(kernel) - 1
    if radius == 0:
        return x * float(kernel[0])
    hl = x.shape[-2]
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    xp = halo_pad_rows(x, axis_name, depth=radius)  # (..., hl + 2r, W)
    # global-boundary shards replace their ghost slabs with the reflect
    # rows (requires hl >= radius + 1, guaranteed by the caller's split)
    top_fix = x[..., 1 : radius + 1, :][..., ::-1, :]  # pad[-j] = x[j]
    bot_fix = x[..., hl - radius : hl, :][..., ::-1, :]  # pad[n-1+j] = x[n-j]
    top = jnp.where(idx == 0, top_fix, xp[..., :radius, :])
    bot = jnp.where(idx == n - 1, bot_fix, xp[..., hl + radius :, :])
    xp = jnp.concatenate([top, xp[..., radius : hl + radius, :], bot], axis=-2)

    def take(offset):
        return xp[..., radius + offset : radius + offset + hl, :]

    out = float(kernel[0]) * take(0)
    for i in range(1, radius + 1):
        out = out + float(kernel[i]) * (take(i) + take(-i))
    return out


def sharded_gaussian_blur(image, sigma: float, mesh: Mesh) -> jnp.ndarray:
    """Reference-exact Gaussian blur of a (H, W) or (C, H, W) image with
    rows sharded over ``mesh``'s 'x' axis. Rows must split evenly across
    the shards with at least radius+1 = int(2*sigma)+2 rows per shard."""
    from ..ops.blur import _blur_axis

    kernel = strip_kernel(float(sigma))
    radius = len(kernel) - 1
    x = jnp.asarray(image, jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    c, h, w = x.shape
    xdim = mesh.shape["x"]
    if h % xdim or h // xdim < radius + 1:
        raise ValueError(
            f"rows ({h}) must split evenly over {xdim} shards with >= "
            f"{radius + 1} rows per shard"
        )
    x = jax.device_put(x, NamedSharding(mesh, P(None, "x", None)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, "x", None), out_specs=P(None, "x", None),
    )
    def run(x_l):
        horiz = _blur_axis(x_l, kernel, axis=x_l.ndim - 1)  # local: full width
        return _vertical_blur_sharded(horiz, kernel, "x")

    out = jax.jit(run)(x)
    return out[0] if squeeze else out


def sharded_pit_fill(
    image, border_value: float, mesh: Mesh, max_sweeps: int = 100_000
) -> jnp.ndarray:
    """Pit-fill fixpoint of a (H, W) raster with rows sharded over 'x'.

    F <- max(original, min over the 8-neighbourhood of F), out-of-image
    neighbours fixed at ``border_value``, iterated to the unique fixpoint;
    each sweep exchanges one ghost row per side and ``psum``s the global
    change flag (the reference's host-read hasChanged,
    PitFillAlgorithm.cpp:132-154, as an on-device collective)."""
    x = jnp.asarray(image, jnp.float32)
    h, w = x.shape
    xdim = mesh.shape["x"]
    if h % xdim:
        raise ValueError(f"rows ({h}) must split evenly over {xdim} shards")
    x = jax.device_put(x, NamedSharding(mesh, P("x", None)))
    border = jnp.float32(border_value)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)
    )
    def run(orig_l):
        hl = orig_l.shape[0]

        def min8(f):
            fp = halo_pad_rows(f, "x", boundary_value=border)
            fp = jnp.pad(fp, ((0, 0), (1, 1)), constant_values=border)
            m = fp[0:hl, 0:w]
            for dr, dc in ((0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)):
                m = jnp.minimum(m, fp[dr : dr + hl, dc : dc + w])
            return m

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_sweeps)

        def body(state):
            f, _, it = state
            nf = jnp.maximum(orig_l, min8(f))
            changed = lax.psum(jnp.any(nf != f).astype(jnp.int32), "x") > 0
            return nf, changed, it + 1

        f0 = jnp.full_like(orig_l, 1.0)
        f, _, _ = lax.while_loop(cond, body, (f0, jnp.asarray(True), jnp.int32(0)))
        return f

    return jax.jit(run)(x)
