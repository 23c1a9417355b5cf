"""Halo exchange for row-sharded stencils.

Inside ``shard_map``, each shard owns a contiguous row block; the 5-point
stencil needs one ghost row from each neighbour. ``ppermute`` moves edge
rows over ICI; mesh-boundary shards receive zeros — exactly the zero
padding the masked operator wants at the image boundary.
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
