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
computes the true residual in f64 *on-device* (a few emulated-f64 sweeps)
and re-solves the correction system with adaptive inner tolerances,
recovering f64-grade accuracy without paying f64 costs in the hot loop
(SURVEY.md §7 "hard parts" (b)). Only scalar norms cross the host boundary.
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


def _cg_core(b, x0, umask, deg, tolerance, max_iterations):
    """Traceable CG body — callable from inside other jitted programs
    (the fused refinement solve in models/fill.py); see :func:`_cg_kernel`
    for the jitted entry point.

    Batched CG over (..., H, W); all channels share A and iterate until
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


_cg_kernel = functools.partial(jax.jit, static_argnames=("max_iterations",))(_cg_core)


def _residual_f64(b64: np.ndarray, x: np.ndarray, umask: np.ndarray, deg: np.ndarray) -> np.ndarray:
    """True residual b - A(x) in host f64 (used by tests/verification)."""
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


@jax.jit
def _residual64_device(b64, x64, umask, deg):
    """True residual on-device in f64 — a few emulated-f64 sweeps instead of
    a multi-hundred-MB host round trip per refinement pass. Returns
    (r64, ||r||_2 per channel)."""
    um = umask.astype(jnp.float64)
    x = x64 * um
    ax = (deg.astype(jnp.float64) * x - shift_sum(x)) * um
    r = (b64 * um - ax) * um
    return r, jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))


@jax.jit
def _accumulate64(x64, d32, umask):
    return x64 + d32.astype(jnp.float64) * umask.astype(jnp.float64)


# per-chunk element budget: solver state is ~40 B/element (f32 CG vectors +
# f64 refinement arrays); 1.5e8 elements keeps a chunk under ~6 GB HBM
MAX_CHUNK_ELEMENTS = 150_000_000


def solve_banded_chunks(solve_fn, b, **kwargs) -> "CGResult":
    """Split a (C, H, W) system into channel chunks that fit HBM and solve
    sequentially — the full-tile path (10980^2 x 13 bands exceeds device
    memory as one batch; the mask/hierarchy is shared so executables are
    reused across chunks)."""
    b = np.asarray(b) if not hasattr(b, "shape") else b
    c, h, w = b.shape
    per_band = h * w
    bands_per_chunk = max(int(MAX_CHUNK_ELEMENTS // per_band), 1)
    if bands_per_chunk >= c:
        return solve_fn(b, **kwargs)
    xs = []
    iters = 0
    err = 0.0
    x0 = kwargs.pop("x0", None)
    for s in range(0, c, bands_per_chunk):
        e = min(s + bands_per_chunk, c)
        sub_kwargs = dict(kwargs)
        if x0 is not None:
            sub_kwargs["x0"] = x0[s:e]
        res = solve_fn(b[s:e], **sub_kwargs)
        xs.append(res.x)
        iters += res.iterations
        err = max(err, res.error)
    if any(isinstance(x, jnp.ndarray) for x in xs):
        x_all = jnp.concatenate([jnp.asarray(x) for x in xs], axis=0)
    else:
        x_all = np.concatenate(xs, axis=0)
    return CGResult(x_all, iters, err)


def solve_masked_poisson(
    b: np.ndarray,
    umask: np.ndarray,
    x0: np.ndarray | None = None,
    deg: np.ndarray | None = None,
    tolerance: float = 1e-6,
    max_iterations: int | None = None,
    refinement_steps: int = 2,
    dtype=jnp.float32,  # kept for API compatibility; the fused path is f32
    device_output: bool = False,
) -> CGResult:
    """Solve A u = b over the unknown set ``umask`` with CG + f64 refinement.

    ``b`` may be (H, W) or (C, H, W) — channels solve simultaneously.
    ``max_iterations`` defaults to n_unknowns/2, the reference's Poisson
    default (poisson.cpp:207); pass a larger cap for machine-precision fills.
    """
    if dtype != jnp.float32:
        import warnings

        warnings.warn(
            "solve_masked_poisson: the fused solve path always runs the inner "
            "CG in f32 (with f64 residual refinement); the `dtype` argument "
            "no longer selects the inner-solve precision.",
            DeprecationWarning,
            stacklevel=2,
        )
    # accept host or device arrays; device inputs never round-trip the host
    # (with the TPU behind a network tunnel, array transfers would dominate)
    b64_j = jnp.asarray(b, dtype=jnp.float64)
    squeeze = b64_j.ndim == 2
    if squeeze:
        b64_j = b64_j[None]
    umask_np = np.asarray(umask, dtype=bool)
    h, w = umask_np.shape
    if deg is None:
        deg = neighbor_degree((h, w))
    n_unknowns = int(umask_np.sum())
    if max_iterations is None:
        max_iterations = max(n_unknowns // 2, 1)
    if n_unknowns == 0:
        x = np.zeros(b64_j.shape)
        return CGResult(x[0] if squeeze else x, 0, 0.0)

    from .multigrid import device_constant

    umask_j = device_constant(umask_np)
    deg_j = device_constant(deg).astype(jnp.float32)

    umf = umask_j.astype(jnp.float64)
    x064 = (
        jnp.zeros(b64_j.shape, jnp.float64)
        if x0 is None
        else jnp.asarray(x0, dtype=jnp.float64).reshape(b64_j.shape) * umf
    )

    # one fused program: the f64 refinement loop (adaptive inner tolerance —
    # each inner f32 CG only covers the *remaining* reduction factor) and
    # the CG while_loop compile together; only the final norms come back
    from .fill import _fused_refine_solve, _recombine64

    x_hi, x_lo, iters_j, rnorm_j, bnorm_j = _fused_refine_solve(
        b64_j, x064, umask_j, deg_j, (), jnp.float64(tolerance),
        max_iterations=max_iterations,
        refinement_steps=max(refinement_steps, 1),
        precond_dtype=jnp.float32, use_multigrid=False, mode="rhs",
    )
    # f64 surface kept for callers; the solve itself runs double-float f32
    x64_j = _recombine64(x_hi, x_lo)
    # ONE batched fetch: separate np.asarray calls each pay a link RTT
    iters_v, rnorm, bnorm = jax.device_get((iters_j, rnorm_j, bnorm_j))
    total_iters = int(iters_v)

    rel = float(np.max(rnorm / np.maximum(bnorm, 1e-300)))
    if device_output:
        # skip the D2H fetch (slow on tunneled-TPU setups); caller gets a
        # device array
        x = x64_j[0] if squeeze else x64_j
        return CGResult(x, total_iters, rel)
    x64 = np.asarray(x64_j)
    x = x64[0] if squeeze else x64
    return CGResult(x, total_iters, rel)
