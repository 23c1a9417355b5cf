"""EXPERIMENT: stationary V-cycle contraction factor vs hierarchy depth.

PCG with a V-cycle preconditioner of quality rho should converge at
~((1-sqrt(1-rho))/(1+sqrt(1-rho)))^k; the observed 13 iters @2048^2 /
19 @10980^2 imply effective rho ~0.8-0.97 — far from textbook MG (<=0.2).
Suspects: the 2x2 any-pool mask coarsening (unknown sets GROW with depth,
so coarse corrections leak across Dirichlet boundaries) and the
rediscretized (non-Galerkin) coarse operator.

Measures ||r_k||/||r_{k-1}|| for stationary iteration u += V(b - A u) at
depth limits 1..full, on the bench mask (6% unknowns, clustered ellipses).

Run: python benchmarks/x_vcontraction.py [--size 2048]
"""

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    import bench
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import (
        masked_laplacian, neighbor_degree, shift_sum,
    )

    import jax
    import jax.numpy as jnp
    from jax import lax

    n = args.size
    umask = bench.make_mask(n, n)
    deg = neighbor_degree((n, n))
    img = bench.smooth(n, n, 0)
    known = img * (~umask)
    b = (shift_sum(jnp.asarray(known)) * umask).astype(jnp.float32)[None]
    hier = multigrid._device_hierarchy(umask, deg)
    um_j, deg_j = hier.levels[0]
    print(f"mask {n}^2: {umask.mean()*100:.1f}% unknown, "
          f"{len(hier.levels)} levels", flush=True)

    @functools.partial(jax.jit, static_argnames=("iters", "depth"))
    def stationary(b, hier, iters, depth):
        levels = tuple(
            (m_, d_.astype(jnp.float32)) for m_, d_ in hier.levels[:depth]
        )
        # depth-limited hierarchies lose the dense coarse inverse (it was
        # built for the FULL coarsest level) — fall back to the budgeted CG
        cinv = hier.coarse_inv if depth >= len(hier.levels) else None
        um, dg = levels[0]
        u0 = jnp.zeros_like(b)

        def body(_, state):
            u, norms, i = state
            r = (b - masked_laplacian(u, um, dg)) * um.astype(b.dtype)
            u = u + multigrid._v_cycle(levels, r, jnp.zeros_like(r), 0, cinv)
            norms = norms.at[i].set(
                jnp.sqrt(jnp.sum(r * r))
            )
            return u, norms, i + 1

        u, norms, _ = lax.fori_loop(
            0, iters, body, (u0, jnp.zeros((iters,), jnp.float32), 0)
        )
        rfin = (b - masked_laplacian(u, um, dg)) * um.astype(b.dtype)
        norms = jnp.concatenate([norms, jnp.sqrt(jnp.sum(rfin * rfin))[None]])
        return norms

    full = len(hier.levels)
    for depth in [2, 3, 4, full]:
        if depth > full:
            continue
        norms = np.asarray(stationary(b, hier, iters=args.iters, depth=depth))
        ratios = norms[1:] / np.maximum(norms[:-1], 1e-30)
        print(
            f"depth {depth:2d}: contraction/iter = "
            + " ".join(f"{r:.3f}" for r in ratios),
            flush=True,
        )


if __name__ == "__main__":
    main()
