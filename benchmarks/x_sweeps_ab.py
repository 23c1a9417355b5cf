"""EXPERIMENT: V-cycle sweep-count A/B under Chebyshev smoothing.

Chebyshev-4 has the same smoothing-interval contraction (0.049) as the old
damped-Jacobi-6 (0.047), and the smoother is VPU-compute-bound (measured
~22 us/sweep/Mwindow at 2048^2) — so fewer, better-placed sweeps should cut
V-cycle time ~25-30% if PCG iteration counts hold.

Run: python benchmarks/x_sweeps_ab.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # repo-root bench.py: the headline problem generator


def main():
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid

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

    for sweeps in (6, 4, 3):
        multigrid._PRE_SMOOTH = sweeps
        multigrid._POST_SMOOTH = sweeps
        # the sweep count is baked into the trace, not a static jit arg —
        # drop every cached executable so each setting really recompiles
        jax.clear_caches()
        def solve():
            res = multigrid.solve(
                b_j, umask, deg=deg, x0=x0_j, tolerance=1e-6,
                refinement_steps=4, device_output=True,
            )
            res.x.block_until_ready()
            return res
        res = solve()  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = solve()
            times.append(time.perf_counter() - t0)
        times.sort()
        print(
            f"sweeps={sweeps}: median {times[2]:.3f}s (min {times[0]:.3f}) "
            f"iters={res.iterations} rel={res.error:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
