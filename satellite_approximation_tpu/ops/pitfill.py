"""Pit-fill (morphological reconstruction by erosion) as a monotone fixpoint.

TPU-native replacement for the reference's iterative OpenCL kernel
(lib/cloud_shadow_detection/source/PitFillAlgorithm.cpp:28-91,120-154):
start from an all-ones surface, repeatedly apply

    F <- max(original, min over the 8-neighbourhood of F)

with out-of-image neighbours fixed at ``border_value``, until nothing
changes. The reference ping-pongs two device buffers with a host-read
"hasChanged" flag per sweep; here the whole loop is a single
``lax.while_loop`` compiled on-device — no host round-trips at all.

**Hierarchical acceleration.** One Jacobi sweep propagates escape
information a single pixel, so the plain fixpoint needs O(basin diameter)
full-raster sweeps — thousands at Sentinel-2 full-tile scale (10980^2).
The fixpoint has a minimax-path characterization: F(p) = max(orig(p),
min over escape paths pi from p to outside of max(orig along pi,
border_value)). Max-pooling the original 2x2 preserves an upper bound:
any coarse escape path threads adjacent fine blocks, and a fine path
through those blocks has max <= the block maxima, so the coarse fixpoint
(pointwise over its block) >= every fine fixpoint value in that block.
Upsampled coarse fixpoints therefore seed each finer level's iteration
*from above* — the monotone-decreasing sweep converges to the SAME unique
from-above fixpoint, but now only needs to repair block-local detail:
O(log n) levels with a handful of sweeps each instead of O(n) sweeps.
Each level still runs to its exact fixpoint, so the result is bit-exact
with the plain iteration (tests/test_ops.py::TestPitFill oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_COARSEST = 64  # stop the pyramid when min dim is at or below this
_DIRECTIONAL_MIN_SIZE = 4_000_000  # levels at/above this use scan cycles first


def _min8(f: jnp.ndarray, border_value) -> jnp.ndarray:
    """Min over the 8-neighbourhood, out-of-bounds = border_value."""
    p = jnp.pad(f, 1, mode="constant", constant_values=border_value)
    h, w = f.shape
    m = p[0:h, 0:w]
    for dr, dc in ((0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)):
        m = jnp.minimum(m, p[dr : dr + h, dc : dc + w])
    return m


def _fixpoint(original, border_value, f0):
    """Run F <- max(original, min8(F)) from ``f0`` (>= the fixpoint) until
    nothing changes. Always performs at least one sweep."""

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        f, _ = state
        nf = jnp.maximum(original, _min8(f, border_value))
        return nf, jnp.any(nf != f)

    f, _ = lax.while_loop(cond, body, (f0, jnp.asarray(True)))
    return f


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def _fixpoint_budget(original, border_value, f0, max_sweeps: int):
    """Like :func:`_fixpoint` but bounded to ``max_sweeps`` sweeps per
    program; returns (f, still_changing). Large rasters iterate this from
    the host: the tunneled-TPU runtime kills any single program running
    ~60 s (measured), so one unbounded while_loop over a 120 Mpix grid is
    not executable there."""

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_sweeps)

    def body(state):
        f, _, it = state
        nf = jnp.maximum(original, _min8(f, border_value))
        return nf, jnp.any(nf != f), it + 1

    f, changed, _ = lax.while_loop(
        cond, body, (f0, jnp.asarray(True), jnp.int32(0))
    )
    return f, changed


def _shift_row(v, d, fill):
    """v shifted by d with fill (1-D)."""
    if d > 0:
        return jnp.concatenate([jnp.full((d,), fill, v.dtype), v[:-d]])
    return jnp.concatenate([v[-d:], jnp.full((-d,), fill, v.dtype)])


def _pass_down(orig, bv, f):
    """One top-to-bottom propagation: each row absorbs the min of its three
    upper 8-neighbours from the already-updated row above (lax.scan carries
    the updated row — information crosses the whole image in ONE pass,
    where a Jacobi sweep moves it one pixel)."""

    def step(prev, xs):
        o_r, f_r = xs
        vert = jnp.minimum(prev, jnp.minimum(_shift_row(prev, 1, bv), _shift_row(prev, -1, bv)))
        nf = jnp.maximum(o_r, jnp.minimum(f_r, vert))
        return nf, nf

    _, rows = lax.scan(step, jnp.full((f.shape[1],), bv, f.dtype), (orig, f))
    return rows


def _directional_cycle(orig, bv, f):
    """Down, up, left, right propagation passes (Vincent-style ordered
    reconstruction, directionally split to keep every per-step op a full
    row/column vector). Monotone from above: each update is
    max(orig, min over self + a SUBSET of the 8 neighbours), which is >=
    the Jacobi update, so iterating from f >= fixpoint stays >= fixpoint."""
    f = _pass_down(orig, bv, f)
    f = _pass_down(orig[::-1], bv, f[::-1])[::-1]
    f = _pass_down(orig.T, bv, f.T).T
    f = _pass_down(orig.T[::-1], bv, f.T[::-1])[::-1].T
    return f


@functools.partial(jax.jit, static_argnames=("max_cycles",))
def _directional_budget(orig, border_value, f0, max_cycles: int):
    """Up to ``max_cycles`` directional cycles; returns (f, still_changing)."""

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_cycles)

    def body(state):
        f, _, it = state
        nf = _directional_cycle(orig, border_value, f)
        return nf, jnp.any(nf != f), it + 1

    f, changed, _ = lax.while_loop(
        cond, body, (f0, jnp.asarray(True), jnp.int32(0))
    )
    return f, changed


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 max-pool via strided slices — the reshape-to-(h/2,2,w/2,2) form
    materializes a badly-laid-out 4-D temporary on TPU (OOMs at 10980^2)."""
    h, w = x.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    xp = jnp.pad(x, ((0, ph - h), (0, pw - w)), constant_values=-jnp.inf)
    return jnp.maximum(
        jnp.maximum(xp[0::2, 0::2], xp[0::2, 1::2]),
        jnp.maximum(xp[1::2, 0::2], xp[1::2, 1::2]),
    )


@jax.jit
def pit_fill(original: jnp.ndarray, border_value: jnp.ndarray | float) -> jnp.ndarray:
    """Fill every pit of ``original`` relative to ``border_value``.

    Matches PitFillAlgorithm::PitFillAlgorithmFilter
    (PitFillAlgorithm.cpp:120-154) exactly at the fixpoint (the reference's
    update schedule differs per-pixel but the from-above fixpoint is
    unique; like the reference, inputs are assumed <= 1 so the all-ones
    start dominates the answer).
    """
    original = original.astype(jnp.float32)
    border_value = jnp.asarray(border_value, dtype=jnp.float32)

    pyramid = [original]
    while min(pyramid[-1].shape) > _COARSEST:
        pyramid.append(_maxpool2(pyramid[-1]))

    f = jnp.ones_like(pyramid[-1])  # reference's all-1s start, coarsest level
    for lvl in range(len(pyramid) - 1, -1, -1):
        orig_l = pyramid[lvl]
        f = _fixpoint(orig_l, border_value, jnp.maximum(orig_l, f))
        if lvl:
            fh, fw = pyramid[lvl - 1].shape
            f = jnp.repeat(jnp.repeat(f, 2, axis=0), 2, axis=1)[:fh, :fw]
    return f


def pit_fill_host(original, border_value, sweep_budget_elems: float = 2e9):
    """Host-orchestrated hierarchical pit fill for large rasters.

    Same levels and numerics as :func:`pit_fill`, but each level's fixpoint
    runs as a sequence of sweep-budgeted programs (budget scaled so one
    program stays well under the runtime's ~60 s single-program limit),
    with a scalar convergence flag fetched between calls. Result is the
    same from-above fixpoint."""
    original = jnp.asarray(original, jnp.float32)
    border_value = jnp.asarray(border_value, dtype=jnp.float32)

    pool = jax.jit(_maxpool2)
    pyramid = [original]
    while min(pyramid[-1].shape) > _COARSEST:
        pyramid.append(pool(pyramid[-1]))

    f = jnp.ones_like(pyramid[-1])
    for lvl in range(len(pyramid) - 1, -1, -1):
        orig_l = pyramid[lvl]
        f = jnp.maximum(orig_l, f)
        # directional scan cycles first on LARGE levels: each pass moves
        # drain information across the whole image (a Jacobi sweep moves it
        # ONE pixel — noisy terrain needed ~18k sweeps at 10980^2, ~220 s;
        # a handful of directional cycles replaces them). Small levels skip
        # them: Jacobi converges quickly there and each level shape would
        # compile its own scan program (minutes on networked runtimes)
        if orig_l.size >= _DIRECTIONAL_MIN_SIZE:
            while True:
                f, changed = _directional_budget(orig_l, border_value, f, max_cycles=8)
                if not bool(changed):
                    break
        # certify/finish with Jacobi: from any f >= fixpoint the monotone
        # operator is sandwiched F* <= J^k(f) <= J^k(1s) -> F*, and the
        # no-change exit lands exactly on F*
        sweeps = max(8, int(sweep_budget_elems // max(orig_l.size, 1)))
        while True:
            f, changed = _fixpoint_budget(orig_l, border_value, f, max_sweeps=sweeps)
            if not bool(changed):
                break
        if lvl:
            fh, fw = pyramid[lvl - 1].shape
            f = jnp.repeat(jnp.repeat(f, 2, axis=0), 2, axis=1)[:fh, :fw]
    return f
