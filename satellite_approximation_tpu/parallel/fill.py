"""Multi-chip image fill: the product-level entry over a device mesh.

Composes the sharded MG-PCG solver (:mod:`.mg`) into the same image-in /
image-out contract as :func:`models.fill.laplace_fill`: assemble the masked
Laplace (or Poisson-editing) right-hand side, solve distributed over the
('b', 'x') mesh with f64 iterative refinement, composite known pixels back.

This is the scale-out path for tiles larger than one chip's HBM or for
latency scaling across a pod slice: rows shard over 'x' (halo exchange via
``ppermute`` on ICI), bands over 'b' (independent systems). Reference
analog: none — the reference is strictly single-device
(ComputeEnvironment.cpp:9-14); this is SURVEY §2.5 P6/P8 as a user-facing
API rather than solver plumbing.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.cg import neighbor_degree
from .mg import sharded_mg_solve, sharded_mg_solve_2d


def _shift_sum_np(x: np.ndarray) -> np.ndarray:
    """Sum of in-image 4-neighbours (zero outside), host-side."""
    h, w = x.shape[-2], x.shape[-1]
    p = np.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    return (
        p[..., 0:h, 1 : w + 1]
        + p[..., 2 : h + 2, 1 : w + 1]
        + p[..., 1 : h + 1, 0:w]
        + p[..., 1 : h + 1, 2 : w + 2]
    )


def sharded_fill(
    image: np.ndarray,
    umask: np.ndarray,
    mesh: Mesh,
    replacement: np.ndarray | None = None,
    tolerance: float = 1e-6,
    max_iterations: int = 100,
):
    """Fill ``image`` where ``umask`` is True, distributed over ``mesh``.

    ``image``: (C, H, W) or (H, W); ``umask``: (H, W) bool. With
    ``replacement`` the system becomes Poisson editing (guidance-divergence
    RHS + Dirichlet boundary, poisson.cpp:103-123; warm start from the
    replacement, :231-257); without it, the Laplace fill
    (laplace.cpp:71-106; warm start from the image itself).

    Returns (filled, iterations, max relative residual): ``filled`` is a
    device array sharded over the mesh, same shape as ``image`` — keep it
    device-resident for downstream sharded stages, or ``np.asarray`` it.
    """
    img = np.asarray(image, np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    um = np.asarray(umask, bool)
    umf = um.astype(np.float64)
    known = img * (1.0 - umf)
    dirichlet = _shift_sum_np(known) * umf

    deg = neighbor_degree(um.shape)
    if replacement is None:
        b = dirichlet
        x0 = img * umf
    else:
        rep = np.asarray(replacement, np.float64)
        if squeeze:
            rep = rep[None]
        b = (deg.astype(np.float64) * rep - _shift_sum_np(rep)) * umf + dirichlet
        x0 = rep * umf

    # band axis must divide the 'b' mesh dim; pad with zero bands (their
    # systems are trivially converged and cost nothing extra inside the
    # shared while_loop) and slice them off after
    bdim = mesh.shape["b"]
    c = b.shape[0]
    cp = -(-c // bdim) * bdim
    if cp != c:
        zpad = [(0, cp - c), (0, 0), (0, 0)]
        b = np.pad(b, zpad)
        x0 = np.pad(x0, zpad)

    # 2-D ('b','y','x') meshes route to the 2-D-tiled solver (rows over 'y',
    # cols over 'x'); 1-D ('b','x') meshes keep the row-sharded solver
    solve = sharded_mg_solve_2d if "y" in mesh.axis_names else sharded_mg_solve
    x, iters, rel = solve(
        b.astype(np.float32),
        x0.astype(np.float32),
        um,
        deg,
        mesh,
        tolerance=tolerance,
        max_iterations=max_iterations,
    )
    if cp != c:
        # the partitioner cannot slice the b-sharded band axis to a
        # non-divisible extent: reshard bands to replicated first
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        spatial = P(None, "y", "x") if "y" in mesh.axis_names else P(None, "x", None)
        x = jax.device_put(x, NamedSharding(mesh, spatial))[:c]
        rel = np.asarray(rel)[:c]
    umf_j = jnp.asarray(umf)
    filled = jnp.asarray(img) * (1.0 - umf_j) + x * umf_j
    if squeeze:
        filled = filled[0]
    return filled, iters, float(np.max(rel))
