"""EXPERIMENT: where does the full-tile per-band solve time go?

Splits the 1-band full-tile fill into its compiled phases and times each
with chained differencing (tunnel RTT ~25 ms makes absolute single-call
timings useless):

  - marginal PCG iteration (the V-cycle + CG overhead)
  - marginal f64 refinement-residual pass (b rebuilt on the fly)
  - assembly (b64/x0)
  - composite
  - total _fused_refine_solve wall, as the ground truth

Run: python benchmarks/x_solve_split.py [--size 10980] [--bands 1]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from x_marginal2 import marginal
from roofline import make_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    ap.add_argument("--bands", type=int, default=1)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models import fill as fillmod
    from satellite_approximation_tpu.models.cg import neighbor_degree

    h = w = args.size
    c = args.bands
    m_np = make_mask(h, w)
    deg_j = jax.jit(
        multigrid._neighbor_degree_traced, static_argnums=(0, 1)
    )(h, w)
    hier = multigrid._device_hierarchy(m_np, deg_j)
    umask_j = hier.levels[0][0]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    float(img.sum())
    pdtype = multigrid._precond_dtype_for((h, w))

    # ---- total fused solve (ground truth) ----
    def total_solve():
        x_hi, x_lo, iters, rn, bn = fillmod._fused_refine_solve(
            img, img, umask_j, deg_j, hier, jnp.float64(1e-6),
            max_iterations=200, refinement_steps=3,
            precond_dtype=pdtype, use_multigrid=True, mode="laplace",
        )
        t0 = time.perf_counter()
        iters_v, rn_v, bn_v = jax.device_get((iters, rn, bn))
        return time.perf_counter() - t0, int(iters_v), float(np.max(rn_v / bn_v))

    # warm
    total_solve()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, iters_v, rel = total_solve()
        times.append(time.perf_counter() - t0)
    times.sort()
    print(f"total fused solve      {times[1]*1e3:9.1f} ms  ({iters_v} iters, rel {rel:.2e})", flush=True)

    # ---- marginal PCG iteration ----
    z0 = jnp.zeros_like(img)

    def pcg_k(k):
        out = multigrid._pcg_run(
            img, z0, jnp.asarray(1e-30, jnp.float32), hier,
            max_iterations=int(k), precond_dtype=pdtype,
        )
        x = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(x)

    sec = marginal(pcg_k, k1=4, k2=14)
    print(f"marginal PCG iteration {sec*1e3:9.2f} ms", flush=True)
    pcg_ms = sec * 1e3

    # ---- marginal f64 residual pass (mode=laplace b rebuild) ----
    um64 = umask_j.astype(jnp.float64)
    from satellite_approximation_tpu.models.cg import shift_sum

    @jax.jit
    def resid_chain(k, x64):
        deg64 = deg_j.astype(jnp.float64)
        img64 = img.astype(jnp.float64)
        b64 = shift_sum(img64 * (1.0 - um64)) * um64

        def body(_, x):
            ax = (deg64 * x * um64 - shift_sum(x * um64)) * um64
            r = (b64 - ax) * um64
            rn = jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))
            return x + 1e-30 * rn[..., None, None]

        return lax.fori_loop(0, k, body, x64).sum()

    x64_0 = img.astype(jnp.float64)
    sec = marginal(lambda k: resid_chain(jnp.int32(k), x64_0), k1=2, k2=10)
    print(f"marginal f64 residual  {sec*1e3:9.2f} ms", flush=True)

    # ---- marginal f32->f64 accumulate (x64 + d*um) ----
    d32 = jnp.ones((c, h, w), jnp.float32)

    @jax.jit
    def accum_chain(k, x64):
        def body(i, x):
            return x + (d32.astype(jnp.float64) * um64) * (1e-30 * (i + 1))

        return lax.fori_loop(0, k, body, x64).sum()

    sec = marginal(lambda k: accum_chain(jnp.int32(k), x64_0), k1=2, k2=10)
    print(f"marginal f64 accum     {sec*1e3:9.2f} ms", flush=True)

    # ---- composite ----
    @jax.jit
    def composite_chain(k, img32):
        def body(i, acc):
            out = fillmod._composite(img32, x64_0, umask_j)
            return acc + out[0, 0, 0]

        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    sec = marginal(lambda k: composite_chain(jnp.int32(k), img), k1=2, k2=10)
    print(f"marginal composite     {sec*1e3:9.2f} ms", flush=True)

    print(f"\n(pcg-iteration share of total at {iters_v} iters: "
          f"{iters_v * pcg_ms:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
