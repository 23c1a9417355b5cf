"""Halo exchange for spatially sharded stencils.

Inside ``shard_map``, each shard owns a contiguous row block (1-D meshes)
or a (row, col) tile (2-D meshes); the 5-point stencil needs one ghost
row/column from each neighbour. ``ppermute`` moves edge slabs over ICI;
mesh-boundary shards receive zeros — exactly the zero padding the masked
operator wants at the image boundary. The 5-point stencil needs no corner
ghosts, so a 2-D exchange is just the row exchange plus an independent
column exchange (no diagonal ppermute).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def halo_pad_rows(
    x: jnp.ndarray, axis_name: str, depth: int = 1, boundary_value: float = 0.0
) -> jnp.ndarray:
    """Return x padded with ``depth`` ghost rows on top and bottom, filled
    from the neighbouring shards along ``axis_name`` (zeros at the mesh
    boundary). ``x`` is (..., H_local, W).

    ``depth > 1`` serves wide stencils (Gaussian blur radius 2*sigma, K
    fused pit-fill sweeps): ONE ppermute of a depth-row slab costs the same
    latency as one ghost row and lets K local sweeps run between exchanges.
    Requires depth <= H_local (a shard must own what it sends)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_rows = x[..., :depth, :]
    bottom_rows = x[..., -depth:, :]
    # send my bottom rows to the shard below (i -> i+1); receive from above
    from_above = lax.ppermute(
        bottom_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # send my top rows to the shard above (i -> i-1); receive from below
    from_below = lax.ppermute(top_rows, axis_name, [(i + 1, i) for i in range(n - 1)])

    fill = jnp.asarray(boundary_value, x.dtype)
    from_above = jnp.where(idx == 0, jnp.full_like(from_above, fill), from_above)
    from_below = jnp.where(idx == n - 1, jnp.full_like(from_below, fill), from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)


def halo_pad_cols(
    x: jnp.ndarray, axis_name: str, depth: int = 1, boundary_value: float = 0.0
) -> jnp.ndarray:
    """Column counterpart of :func:`halo_pad_rows`: x padded with ``depth``
    ghost columns left and right from the neighbouring shards along
    ``axis_name`` (zeros at the mesh boundary). ``x`` is (..., H, W_local).

    On TPU the column (lane) dim concatenation costs a relayout, but the
    exchanged slab is depth columns — tiny next to the tile — and the
    alternative (strided gathers) is worse; keep per-shard widths >= 256
    lanes so the relayout amortizes."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    left_cols = x[..., :, :depth]
    right_cols = x[..., :, -depth:]
    # send my right cols to the shard to the right (i -> i+1); recv from left
    from_left = lax.ppermute(
        right_cols, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # send my left cols to the shard to the left (i -> i-1); recv from right
    from_right = lax.ppermute(left_cols, axis_name, [(i + 1, i) for i in range(n - 1)])

    fill = jnp.asarray(boundary_value, x.dtype)
    from_left = jnp.where(idx == 0, jnp.full_like(from_left, fill), from_left)
    from_right = jnp.where(idx == n - 1, jnp.full_like(from_right, fill), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)
