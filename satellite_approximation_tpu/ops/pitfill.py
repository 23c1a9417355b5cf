"""Pit-fill (morphological reconstruction by erosion) as a monotone fixpoint.

TPU-native replacement for the reference's iterative OpenCL kernel
(lib/cloud_shadow_detection/source/PitFillAlgorithm.cpp:28-91,120-154):
start from an all-ones surface, repeatedly apply

    F <- max(original, min over the 8-neighbourhood of F)

with out-of-image neighbours fixed at ``border_value``, until nothing
changes. The iteration is monotone non-increasing and selects only values
already present in {original values, border_value}, so it converges exactly
in finitely many sweeps. The reference ping-pongs two device buffers with a
host-read "hasChanged" flag per sweep; here the whole loop is a single
``lax.while_loop`` compiled on-device — no host round-trips at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _min8(f: jnp.ndarray, border_value) -> jnp.ndarray:
    """Min over the 8-neighbourhood, out-of-bounds = border_value."""
    p = jnp.pad(f, 1, mode="constant", constant_values=border_value)
    h, w = f.shape
    m = p[0:h, 0:w]
    for dr, dc in ((0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)):
        m = jnp.minimum(m, p[dr : dr + h, dc : dc + w])
    return m


@jax.jit
def pit_fill(original: jnp.ndarray, border_value: jnp.ndarray | float) -> jnp.ndarray:
    """Fill every pit of ``original`` relative to ``border_value``.

    Matches PitFillAlgorithm::PitFillAlgorithmFilter
    (PitFillAlgorithm.cpp:120-154) exactly at the fixpoint (the reference's
    update schedule differs per-pixel but the fixpoint is unique).
    """
    original = original.astype(jnp.float32)
    border_value = jnp.asarray(border_value, dtype=jnp.float32)

    def cond(state):
        f, changed = state
        return changed

    def body(state):
        f, _ = state
        nf = jnp.maximum(original, _min8(f, border_value))
        return nf, jnp.any(nf != f)

    init = jnp.ones_like(original)
    # One unconditional first sweep so `changed` starts meaningfully.
    first = jnp.maximum(original, _min8(init, border_value))
    f, _ = lax.while_loop(cond, body, (first, jnp.any(first != init)))
    return f
