"""Matrix-free masked-Laplacian conjugate gradient on the VPU.

The reference assembles explicit Eigen sparse systems — one row per bbox
pixel with identity rows for knowns (laplace.cpp:63-106) or one row per
masked pixel (poisson.cpp:179-216) — and runs Eigen::ConjugateGradient with
OpenMP-threaded SpMV. On TPU the matrix is never materialized: the operator

    A(u)[p] = deg[p] * u[p] - sum_{q in N4(p), q unknown} u[q]

is five shifted adds fused by XLA into a single VPU sweep, vmapped over the
band axis so all channels solve simultaneously (the reference loops channels
sequentially, poisson.cpp:226-270).

Precision: CG runs in f32 on-device; an outer iterative-refinement loop
computes the true residual in f64 on the host and re-solves for the
correction, recovering f64-grade accuracy without paying TPU f64 emulation
costs in the hot loop (SURVEY.md §7 "hard parts" (b)).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def neighbor_degree(shape: tuple[int, int]) -> np.ndarray:
    """Number of in-image 4-neighbours per pixel: 4 interior, 3 edge,
    2 corner — the reference's ``valid_neighbours`` count
    (approx/utils.h:36-50)."""
    h, w = shape
    deg = np.full(shape, 4.0, dtype=np.float32)
    deg[0, :] -= 1
    deg[-1, :] -= 1
    deg[:, 0] -= 1
    deg[:, -1] -= 1
    return deg


def shift_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the four in-image neighbours (zero outside), batched over
    leading axes. The stencil core of every solve."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad)
    return (
        p[..., 0:h, 1 : w + 1]
        + p[..., 2 : h + 2, 1 : w + 1]
        + p[..., 1 : h + 1, 0:w]
        + p[..., 1 : h + 1, 2 : w + 2]
    )


def masked_laplacian(u: jnp.ndarray, umask: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """A(u) restricted to the unknown set: deg*u - sum of unknown neighbours.
    ``u`` is (..., H, W); ``umask``/``deg`` are (H, W)."""
    um = umask.astype(u.dtype)
    au = deg.astype(u.dtype) * u - shift_sum(u * um)
    return au * um


def _dots(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-channel dot over the pixel axes, f32 accumulate."""
    return jnp.sum(a * b, axis=(-2, -1))


@dataclasses.dataclass
class CGResult:
    x: np.ndarray
    iterations: int
    error: float  # final relative residual ||b - Ax|| / ||b|| (f64, true)


@functools.partial(jax.jit, static_argnames=("max_iterations",))
def _cg_kernel(b, x0, umask, deg, tolerance, max_iterations):
    """Batched CG over (..., H, W); all channels share A and iterate until
    every channel satisfies ||r||^2 <= tol^2 ||b||^2 (Eigen's criterion,
    Eigen/ConjugateGradient.h) or max_iterations."""
    um = umask.astype(b.dtype)
    b = b * um
    x = x0 * um
    r = b - masked_laplacian(x, umask, deg)
    p = r
    rs = _dots(r, r)
    bs = _dots(b, b)
    threshold = jnp.maximum(tolerance * tolerance * bs, jnp.finfo(b.dtype).tiny)

    def cond(state):
        _, _, _, rs, it = state
        return jnp.logical_and(jnp.any(rs > threshold), it < max_iterations)

    def body(state):
        x, r, p, rs, it = state
        ap = masked_laplacian(p, umask, deg)
        pap = _dots(p, ap)
        alpha = jnp.where(pap > 0, rs / jnp.where(pap > 0, pap, 1.0), 0.0)
        a = alpha[..., None, None]
        x = x + a * p
        r = r - a * ap
        rs_new = _dots(r, r)
        beta = jnp.where(rs > 0, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
        p = r + beta[..., None, None] * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = lax.while_loop(cond, body, (x, r, p, rs, jnp.int32(0)))
    return x, it, jnp.sqrt(rs / jnp.maximum(bs, jnp.finfo(b.dtype).tiny))


def _residual_f64(b64: np.ndarray, x: np.ndarray, umask: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """True residual b - A(x) in host f64."""
    um = umask.astype(np.float64)
    x = x.astype(np.float64) * um
    p = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    h, w = x.shape[-2], x.shape[-1]
    s = (
        p[..., 0:h, 1 : w + 1]
        + p[..., 2 : h + 2, 1 : w + 1]
        + p[..., 1 : h + 1, 0:w]
        + p[..., 1 : h + 1, 2 : w + 2]
    )
    ax = (deg.astype(np.float64) * x - s) * um
    return (b64 - ax) * um


def solve_masked_poisson(
    b: np.ndarray,
    umask: np.ndarray,
    x0: np.ndarray | None = None,
    deg: np.ndarray | None = None,
    tolerance: float = 1e-6,
    max_iterations: int | None = None,
    refinement_steps: int = 2,
    dtype=jnp.float32,
) -> CGResult:
    """Solve A u = b over the unknown set ``umask`` with CG + f64 refinement.

    ``b`` may be (H, W) or (C, H, W) — channels solve simultaneously.
    ``max_iterations`` defaults to n_unknowns/2, the reference's Poisson
    default (poisson.cpp:207); pass a larger cap for machine-precision fills.
    """
    b64 = np.asarray(b, dtype=np.float64)
    squeeze = b64.ndim == 2
    if squeeze:
        b64 = b64[None]
    umask_np = np.asarray(umask, dtype=bool)
    h, w = umask_np.shape
    if deg is None:
        deg = neighbor_degree((h, w))
    deg = np.asarray(deg, dtype=np.float32)
    n_unknowns = int(umask_np.sum())
    if max_iterations is None:
        max_iterations = max(n_unknowns // 2, 1)
    if n_unknowns == 0:
        x = np.zeros_like(b64)
        return CGResult(x[0] if squeeze else x, 0, 0.0)

    umask_j = jnp.asarray(umask_np)
    deg_j = jnp.asarray(deg)
    x64 = (
        np.zeros_like(b64)
        if x0 is None
        else np.asarray(x0, dtype=np.float64).reshape(b64.shape) * umask_np
    )

    total_iters = 0
    rhs = b64 * umask_np
    target = tolerance * np.linalg.norm(rhs.reshape(rhs.shape[0], -1), axis=1)

    r64 = _residual_f64(b64, x64, umask_np, deg)
    for step in range(max(refinement_steps, 1)):
        rnorm = np.linalg.norm(r64.reshape(r64.shape[0], -1), axis=1)
        if np.all(rnorm <= np.maximum(target, 1e-300)):
            break
        # inner f32 CG on the residual system A d = r
        d, iters, _ = _cg_kernel(
            jnp.asarray(r64, dtype=dtype),
            jnp.zeros(r64.shape, dtype=dtype),
            umask_j,
            deg_j,
            jnp.asarray(tolerance * 0.5, dtype=dtype),
            max_iterations,
        )
        total_iters += int(iters)
        x64 = x64 + np.asarray(jax.device_get(d), dtype=np.float64) * umask_np
        r64 = _residual_f64(b64, x64, umask_np, deg)

    bnorm = np.linalg.norm(rhs.reshape(rhs.shape[0], -1), axis=1)
    rnorm = np.linalg.norm(r64.reshape(r64.shape[0], -1), axis=1)
    rel = float(np.max(rnorm / np.maximum(bnorm, 1e-300)))
    x = x64[0] if squeeze else x64
    return CGResult(x, total_iters, rel)
