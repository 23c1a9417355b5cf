"""EXPERIMENT: decompose the fixed per-solve cost of _fused_refine_solve.

bench-scale solve (13 bands, 2048^2) = 0.485 s, of which PCG iterations are
only ~45 ms and modeled f64 refinement passes ~100 ms. This isolates the
rest by timing, with chained differencing where possible:

  A. _pcg_run with max_iterations=0  -> one PCG shell (residual + precond)
  B. _fused_refine_solve with refinement_steps=1 vs 3  -> per-pass cost
  C. the f64 residual pass alone (chained)             -> f64 emulation cost
  D. full multigrid.solve                              -> end-to-end

Run: python benchmarks/x_shell.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench


# NOTE: on this tunneled runtime block_until_ready returns immediately
# (measured: 0.2 ms for a ~5 ms program); only a VALUE fetch synchronizes.
# Every timed callable therefore ends in a float() materialization — one
# ~25 ms RTT, constant, removed by differencing.


def timeit(label, fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:58s} {ts[len(ts)//2]*1e3:9.1f} ms (min {ts[0]*1e3:.1f})", flush=True)
    return ts[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import shift_sum
    from satellite_approximation_tpu.models.fill import _fused_refine_solve

    H = W = bench.H
    umask = bench.make_mask(H, W)
    deg = np.full((H, W), 4.0, dtype=np.float32)
    deg[0, :] -= 1; deg[-1, :] -= 1; deg[:, 0] -= 1; deg[:, -1] -= 1
    imgs = np.stack([bench.smooth(H, W, s) for s in range(bench.BANDS)])
    known = imgs * (~umask)
    p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
    b = (
        p[:, 0:H, 1:W+1] + p[:, 2:H+2, 1:W+1] + p[:, 1:H+1, 0:W] + p[:, 1:H+1, 2:W+2]
    ) * umask
    x0 = imgs * umask
    b_j = jnp.asarray(b, jnp.float64)
    x0_j = jnp.asarray(x0, jnp.float64)
    jax.block_until_ready((b_j, x0_j))

    hier = multigrid._device_hierarchy(umask, deg)
    um_j, deg_j = hier.levels[0]
    pdtype = multigrid._precond_dtype_for((H, W))
    r32 = jnp.asarray(b, jnp.float32)
    z32 = jnp.zeros_like(r32)
    jax.block_until_ready((r32, z32))

    # A: PCG shell, 0 iterations
    def pcg(k):
        def run():
            out = multigrid._pcg_run(
                r32, z32, jnp.asarray(1e-30, jnp.float32), hier,
                max_iterations=k, precond_dtype=pdtype,
            )
            return float(jnp.sum(out[0][..., ::499, ::499]))
        return run
    tA0 = timeit("A: _pcg_run k=0 (shell: residual+precond+dots)", pcg(0))
    tA4 = timeit("A: _pcg_run k=4", pcg(4))
    print(f"   -> marginal PCG iteration: {(tA4 - tA0)/4*1e3:.2f} ms")

    # B: fused refine solve at 1 vs 3 refinement passes (tolerance tiny so
    # every allowed pass runs; max_iterations=2 keeps PCG cost small)
    def frs(steps):
        def run():
            out = _fused_refine_solve(
                b_j, x0_j, um_j, deg_j, hier, jnp.float64(1e-300),
                max_iterations=2, refinement_steps=steps,
                precond_dtype=pdtype, use_multigrid=True, mode="rhs",
            )
            return float(jnp.sum(out[0][..., ::499, ::499]))
        return run
    tB1 = timeit("B: _fused_refine_solve 1 pass (2 PCG iters)", frs(1))
    tB3 = timeit("B: _fused_refine_solve 3 passes", frs(3))
    print(f"   -> per refinement pass: {(tB3 - tB1)/2*1e3:.2f} ms")

    # C: f64 residual pass alone, chained (b passed as an ARGUMENT —
    # captured as a closure constant it gets inlined into the program and
    # the remote compile rejects the 436 MB request body)
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("k",))
    def resid_chain(x64, bb_j, k):
        um64 = um_j.astype(jnp.float64)
        deg64 = deg_j.astype(jnp.float64)

        def body(_, x):
            bb = shift_sum(bb_j * (1.0 - um64)) * um64
            ax = (deg64 * x - shift_sum(x)) * um64
            return x + 1e-300 * (bb - ax)
        return lax.fori_loop(0, k, body, x64)

    def fC(k):
        def run():
            out = resid_chain(x0_j, b_j, k=k)
            return float(jnp.sum(out[..., ::499, ::499]))
        return run
    t8 = timeit("C: 8 chained f64 residual passes", fC(8))
    t2 = timeit("C: 2 chained f64 residual passes", fC(2))
    print(f"   -> per f64 residual pass: {(t8 - t2)/6*1e3:.2f} ms")

    # D: end-to-end
    def solve():
        res = multigrid.solve(
            b_j, umask, deg=deg, x0=x0_j, tolerance=1e-6,
            refinement_steps=4, device_output=True,
        )
        res.x.block_until_ready()
        return res
    timeit("D: full multigrid.solve @1e-6", solve)


if __name__ == "__main__":
    main()
