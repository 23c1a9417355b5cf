"""Halo exchange for row-sharded stencils.

Inside ``shard_map``, each shard owns a contiguous row block; the 5-point
stencil needs one ghost row from each neighbour. ``ppermute`` moves edge
rows over ICI; mesh-boundary shards receive zeros — exactly the zero
padding the masked operator wants at the image boundary.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def halo_pad_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Return x padded with one ghost row on top and bottom, filled from the
    neighbouring shards along ``axis_name`` (zeros at the mesh boundary).
    ``x`` is (..., H_local, W)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    top_row = x[..., :1, :]
    bottom_row = x[..., -1:, :]
    # send my bottom row to the shard below (i -> i+1); receive from above
    from_above = lax.ppermute(
        bottom_row, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # send my top row to the shard above (i -> i-1); receive from below
    from_below = lax.ppermute(top_row, axis_name, [(i + 1, i) for i in range(n - 1)])

    from_above = jnp.where(idx == 0, jnp.zeros_like(from_above), from_above)
    from_below = jnp.where(idx == n - 1, jnp.zeros_like(from_below), from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)
