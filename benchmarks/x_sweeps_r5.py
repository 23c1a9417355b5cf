"""EXPERIMENT (round 5): sweep-count re-A/B under the az-fused cost model.

Round 3 fixed K=6 Chebyshev sweeps when the smoother was judged
VPU-compute-bound at ~22 us/sweep marginal (2048^2). Round 5 changed the
iteration's cost structure (A-apply folded into the post-smooth kernel's
residual ring; deferred norm fetches), so the optimum K is re-measured at
full tile: marginal PCG iteration cost AND iterations-to-1e-6 per K, total
projected band-solve = solve wall measured directly.

Note the az fusion's ring budget caps post sweeps at HALO_R - 1 = 7.

Run: python benchmarks/x_sweeps_r5.py [--size 10980]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from roofline import make_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    ap.add_argument("--ks", type=str, default="6,4,5,7")
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid as M
    from satellite_approximation_tpu.models import fill as F

    h = w = args.size
    m_np = make_mask(h, w)
    umask_j = jnp.asarray(m_np)
    deg_j = jax.jit(M._neighbor_degree_traced, static_argnums=(0, 1))(h, w)
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        (rng.random((1, h, w)) * 10000).astype(np.float32)
    )
    float(img.sum())
    hier = M._device_hierarchy(m_np, np.asarray(deg_j))
    pdtype = M._precond_dtype_for((h, w))

    from x_marginal2 import marginal

    base = (M._PRE_SMOOTH, M._POST_SMOOTH)
    for k in [int(x) for x in args.ks.split(",")]:
        M._PRE_SMOOTH = M._POST_SMOOTH = k
        M._pcg_run.clear_cache()
        F._fused_refine_solve.clear_cache()

        z0 = jnp.zeros_like(img)

        def pcg_k(n):
            out = M._pcg_run(
                img, z0, jnp.asarray(1e-30, jnp.float32), hier,
                max_iterations=int(n), precond_dtype=pdtype,
            )
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])

        sec = marginal(pcg_k, k1=4, k2=14)

        def solve_once():
            t0 = time.perf_counter()
            x_hi, x_lo, iters, rnorm, bnorm = F._fused_refine_solve(
                img, img, umask_j, deg_j, hier, jnp.float64(1e-6),
                max_iterations=200, refinement_steps=3,
                precond_dtype=pdtype, use_multigrid=True, mode="laplace",
            )
            iters_v, rn, bn = jax.device_get((iters, rnorm, bnorm))
            dt = time.perf_counter() - t0
            rel = float(np.max(rn / np.maximum(bn, 1e-300)))
            return dt, int(iters_v), rel

        solve_once()  # compile
        runs = [solve_once() for _ in range(3)]
        runs.sort()
        dt, iters_v, rel = runs[1]
        print(
            f"K={k}: marginal iter {sec*1e3:7.2f} ms | band solve "
            f"{dt*1e3:7.1f} ms, {iters_v} iters, rel {rel:.2e}",
            flush=True,
        )
    M._PRE_SMOOTH, M._POST_SMOOTH = base


if __name__ == "__main__":
    main()
