"""Sharded matrix-free CG: the multi-chip form of models/cg.py.

Bands shard over the 'b' mesh axis (independent systems — pure data
parallelism); image rows shard over 'x' (the spatial axis). Each CG
iteration does one halo exchange (``ppermute`` over ICI) for the stencil
and ``psum`` reductions for the dot products — textbook SPMD PDE solving,
entirely inside a single compiled ``shard_map``-ped ``while_loop``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .halo import halo_pad_rows


def _sharded_stencil(u: jnp.ndarray, um: jnp.ndarray, deg: jnp.ndarray, axis: str) -> jnp.ndarray:
    """A(u) = deg*u - sum of unknown 4-neighbours, with ghost rows from the
    neighbouring shards."""
    masked = u * um
    padded = halo_pad_rows(masked, axis)  # (..., H+2, W)
    h = u.shape[-2]
    w = u.shape[-1]
    wpad = jnp.pad(masked, [(0, 0)] * (u.ndim - 2) + [(0, 0), (1, 1)])
    s = (
        padded[..., 0:h, :]
        + padded[..., 2 : h + 2, :]
        + wpad[..., :, 0:w]
        + wpad[..., :, 2 : w + 2]
    )
    return (deg * u - s) * um


def _cg_body(b, x0, um, deg, tol, max_iters, axis, all_axes):
    """Local CG over a row shard; dots reduced with psum over the spatial
    axis. Bands are fully local (the 'b' axis shards independent systems),
    but the loop-continue flag is reduced over ``all_axes`` so every shard
    runs the same trip count — collectives inside a while_loop must be
    mesh-uniform or the runtime rendezvous deadlocks."""

    def dots(p, q):
        local = jnp.sum(p * q, axis=(-2, -1))
        return lax.psum(local, axis)

    b = b * um
    x = x0 * um
    r = b - _sharded_stencil(x, um, deg, axis)
    p = r
    rs = dots(r, r)
    bs = dots(b, b)
    threshold = jnp.maximum(tol * tol * bs, jnp.finfo(b.dtype).tiny)

    def cond(state):
        _, _, _, rs_c, it = state
        # rs is already x-invariant after the psum inside dots(); reducing
        # the continue-flag over the remaining axes makes it mesh-uniform.
        flag = jnp.any(rs_c > threshold).astype(jnp.int32)
        for ax in all_axes:
            if ax != axis:
                flag = lax.psum(flag, ax)
        return jnp.logical_and(flag > 0, it < max_iters)

    def body(state):
        x, r, p, rs_c, it = state
        ap = _sharded_stencil(p, um, deg, axis)
        pap = dots(p, ap)
        alpha = jnp.where(pap > 0, rs_c / jnp.where(pap > 0, pap, 1.0), 0.0)
        a = alpha[..., None, None]
        x = x + a * p
        r = r - a * ap
        rs_new = dots(r, r)
        beta = jnp.where(rs_c > 0, rs_new / jnp.where(rs_c > 0, rs_c, 1.0), 0.0)
        p = r + beta[..., None, None] * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    return x, it, rs


def sharded_masked_cg(
    b: jnp.ndarray,
    x0: jnp.ndarray,
    umask: jnp.ndarray,
    deg: jnp.ndarray,
    mesh: Mesh,
    tolerance: float = 1e-6,
    max_iterations: int = 1000,
):
    """Solve the masked Poisson system over a ('b', 'x') mesh.

    ``b``/``x0`` are (C, H, W) — C shards over 'b', H over 'x';
    ``umask``/``deg`` are (H, W), row-sharded and replicated over bands.
    Returns (x, iterations, final ||r||^2 per channel).
    """
    tol = jnp.asarray(tolerance, dtype=b.dtype)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("b", "x", None), P("b", "x", None), P("x", None), P("x", None)),
        out_specs=(P("b", "x", None), P(), P("b")),
    )
    def run(b_l, x0_l, um_l, deg_l):
        um = um_l.astype(b_l.dtype)
        x, it, rs = _cg_body(b_l, x0_l, um, deg_l, tol, max_iterations, "x", ("b", "x"))
        return x, it, rs

    return jax.jit(run)(b, x0, umask, deg)


def sharded_training_step(mesh: Mesh):
    """One full 'training step' of the flagship workload, jitted over the
    mesh: Poisson RHS assembly (guidance divergence + boundary injection,
    poisson.cpp:234-254 semantics) fused with a fixed-budget sharded CG
    solve. Used by the multi-chip dry run."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("b", "x", None), P("b", "x", None), P("x", None)),
        out_specs=(P("b", "x", None), P("b")),
    )
    def step(inputs_l, repl_l, umask_l):
        um = umask_l.astype(inputs_l.dtype)
        h = inputs_l.shape[-2]
        w = inputs_l.shape[-1]

        # degree: in-image neighbour count; rows at the global image border
        # (first/last shard only) lose one
        idx = lax.axis_index("x")
        n = lax.axis_size("x")
        deg = jnp.full((h, w), 4.0, dtype=inputs_l.dtype)
        deg = deg.at[:, 0].add(-1.0).at[:, -1].add(-1.0)
        row_ids = jnp.arange(h)
        top_edge = (idx == 0) & (row_ids == 0)
        bottom_edge = (idx == n - 1) & (row_ids == h - 1)
        deg = deg - top_edge[:, None].astype(deg.dtype) - bottom_edge[:, None].astype(deg.dtype)

        # RHS: sum_q (g_p - g_q) + known-neighbour boundary values
        def s4(x):
            padded = halo_pad_rows(x, "x")
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 1)])
            return (
                padded[..., 0:h, :]
                + padded[..., 2 : h + 2, :]
                + xp[..., :, 0:w]
                + xp[..., :, 2 : w + 2]
            )

        grad_sum = deg * repl_l - s4(repl_l)
        boundary = s4(inputs_l * (1.0 - um))
        b = (grad_sum + boundary) * um

        x, it, rs = _cg_body(b, repl_l * um, um, deg, jnp.asarray(1e-5, b.dtype), 64, "x", ("b", "x"))
        out = inputs_l * (1.0 - um) + x * um
        return out, rs

    return step
