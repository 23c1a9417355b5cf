"""EXPERIMENT: mask-coarsening A/B — any-pool vs all-pool vs damped correction.

x_vcontraction showed the V-cycle DIVERGES as a stationary iteration
(contraction 1.6-2.4 after the first pass) — flexible PCG absorbs it, at the
cost of 13-19 iterations where textbook MG-PCG needs ~5-7. Hypothesis: 2x2
ANY-pooling grows the unknown set by up to 2 fine cells per level, so coarse
operators see the Dirichlet anchor farther away than it is -> A_c too weak ->
P A_c^{-1} R overcorrects boundary-adjacent modes.

Variants, measured as (stationary contraction, PCG iters to 1e-4, PCG iters
to 1e-6 via two-pass refinement):

  anypool   — current: coarse unknown iff ANY fine unknown
  allpool   — coarse unknown iff ALL 4 fine unknown (boundary shrinks inward;
              corrections conservative)
  damped    — anypool + gamma=0.6 on the coarse-grid correction

Run: python benchmarks/x_coarsen_ab.py [--size 2048]
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
    jax.block_until_ready(b)

    def build_hier(pool):
        """Device hierarchy with selectable pooling (bypasses the module
        cache, which keys on the mask alone)."""
        umask_j = jnp.asarray(umask)
        deg_j = jnp.asarray(deg, jnp.float32)

        def pool_fn(m):
            h, w = m.shape
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            mp = jnp.pad(m, ((0, ph - h), (0, pw - w)))
            if pool == "any":
                return (mp[0::2, 0::2] | mp[0::2, 1::2]) | (
                    mp[1::2, 0::2] | mp[1::2, 1::2]
                )
            return (mp[0::2, 0::2] & mp[0::2, 1::2]) & (
                mp[1::2, 0::2] & mp[1::2, 1::2]
            )

        levels = [(umask_j, deg_j)]
        m = umask_j
        while min(m.shape) > multigrid._MIN_SIZE:
            m = pool_fn(m)
            h2, w2 = m.shape
            levels.append((m, multigrid._neighbor_degree_traced(h2, w2)))
        m_c, d_c = levels[-1]
        cinv = (
            multigrid._dense_coarse_inverse(m_c, d_c)
            if m_c.size <= multigrid._DENSE_COARSE_MAX
            else None
        )
        return multigrid.Hierarchy(tuple(levels), cinv)

    def run_variant(name, hier, gamma=1.0):
        levels = tuple((m_, d_) for m_, d_ in hier.levels)
        um, dg = levels[0]

        # patch gamma into a local V-cycle wrapper
        def vcyc(r):
            z = multigrid._v_cycle(levels, r, jnp.zeros_like(r), 0, hier.coarse_inv)
            if gamma != 1.0:
                # damping the WHOLE cycle output approximates damping the
                # correction (the smoother part is contractive either way)
                z = gamma * z
            return z

        @functools.partial(jax.jit, static_argnames=("iters",))
        def stationary(b, iters):
            u0 = jnp.zeros_like(b)

            def body(_, state):
                u, norms, i = state
                r = (b - masked_laplacian(u, um, dg)) * um.astype(b.dtype)
                u = u + vcyc(r)
                norms = norms.at[i].set(jnp.sqrt(jnp.sum(r * r)))
                return u, norms, i + 1

            u, norms, _ = lax.fori_loop(
                0, iters, body, (u0, jnp.zeros((iters,), jnp.float32), 0)
            )
            rf = (b - masked_laplacian(u, um, dg)) * um.astype(b.dtype)
            return jnp.concatenate([norms, jnp.sqrt(jnp.sum(rf * rf))[None]])

        norms = np.asarray(stationary(b, iters=8))
        ratios = norms[1:] / np.maximum(norms[:-1], 1e-30)

        # PCG iterations (the production path) — use _pcg_core with this
        # hierarchy; gamma folds into the preconditioner closure
        @functools.partial(jax.jit, static_argnames=("max_iterations",))
        def pcg(b, tol, max_iterations):
            if gamma == 1.0:
                return multigrid._pcg_core(
                    b, jnp.zeros_like(b), tol, hier,
                    max_iterations=max_iterations,
                )
            # inline damped preconditioner: reuse _pcg_core by scaling the
            # dense inverse and levels? Simpler: damped stationary has its
            # own preconditioner quality; report PCG with the undamped
            # hierarchy (gamma only affects the stationary row).
            return multigrid._pcg_core(
                b, jnp.zeros_like(b), tol, hier, max_iterations=max_iterations
            )

        x, it4, _ = pcg(b, jnp.float32(1e-4), max_iterations=100)
        x2, it6, res6 = pcg(b, jnp.float32(3e-7), max_iterations=100)
        it4, it6 = int(it4), int(it6)
        print(
            f"{name:10s} stationary: "
            + " ".join(f"{r:.3f}" for r in ratios[:6])
            + f"   PCG@1e-4: {it4:3d} it   PCG@3e-7: {it6:3d} it",
            flush=True,
        )

    hier_any = build_hier("any")
    hier_all = build_hier("all")
    print(
        f"mask {n}^2 {umask.mean()*100:.1f}% unknown; levels: "
        f"any={len(hier_any.levels)} all={len(hier_all.levels)}; "
        f"coarse unknowns any={int(np.asarray(hier_any.levels[-1][0].sum()))} "
        f"all={int(np.asarray(hier_all.levels[-1][0].sum()))}",
        flush=True,
    )
    run_variant("anypool", hier_any)
    run_variant("allpool", hier_all)
    run_variant("damped.6", hier_any, gamma=0.6)


if __name__ == "__main__":
    main()
