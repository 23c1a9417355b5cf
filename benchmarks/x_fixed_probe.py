"""EXPERIMENT (round 5): empirically decompose the full-tile per-band solve
into FIXED vs PER-ITERATION cost.

Method: run the production fused solve with max_iterations=0 (the inner PCG
while_loop body never executes, but everything else — cascades, bnorm, the
per-pass setup precond + dots, TwoSum accumulate, composite — runs exactly
as in production) and with the production setting; the difference / iters
is the true in-context per-iteration cost. Also times the chained bare
dispatch (empty jit) to bound host-dispatch overhead.

Run: python benchmarks/x_fixed_probe.py [--size 10980]
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
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import fill as F
    from satellite_approximation_tpu.models import multigrid as M

    h = w = args.size
    m_np = make_mask(h, w)
    umask_j = jnp.asarray(m_np)
    deg_j = jax.jit(M._neighbor_degree_traced, static_argnums=(0, 1))(h, w)
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((1, h, w)) * 10000).astype(np.float32))
    float(img.sum())
    hier = M._device_hierarchy(m_np, np.asarray(deg_j))
    pdtype = M._precond_dtype_for((h, w))
    tol = jnp.float64(1e-6)

    def solve(max_iters, steps):
        t0 = time.perf_counter()
        out = F._fused_refine_solve(
            img, img, umask_j, deg_j, hier, tol,
            max_iterations=max_iters, refinement_steps=steps,
            precond_dtype=pdtype, use_multigrid=True, mode="laplace",
        )
        iters_v, rn, bn = jax.device_get((out[2], out[3], out[4]))
        return time.perf_counter() - t0, int(iters_v), float(
            np.max(rn / np.maximum(bn, 1e-300))
        )

    for label, mi, steps in (
        ("production (mi=200, steps=3)", 200, 3),
        ("fixed-only (mi=0, steps=1)", 0, 1),
        ("fixed-only (mi=0, steps=2)", 0, 2),
        ("fixed-only (mi=0, steps=3)", 0, 3),
    ):
        solve(mi, steps)  # compile
        runs = sorted(solve(mi, steps) for _ in range(3))
        dt, it, rel = runs[1]
        print(f"{label:32s} {dt*1e3:8.1f} ms  iters {it}  rel {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
