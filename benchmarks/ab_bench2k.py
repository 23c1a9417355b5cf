"""Same-session A/B of PRECOND_DTYPE on the bench.py workload (3 reps each)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # the repo-root bench module


def main():
    import satellite_approximation_tpu  # noqa: F401
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid

    m = bench.make_mask(bench.H, bench.W)
    img = np.stack([bench.smooth(bench.H, bench.W, s) for s in range(bench.BANDS)])
    known = img * (~m)
    p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
    H, W = bench.H, bench.W
    b = (
        p[:, 0:H, 1 : W + 1] + p[:, 2 : H + 2, 1 : W + 1]
        + p[:, 1 : H + 1, 0:W] + p[:, 1 : H + 1, 2 : W + 2]
    ) * m
    x0 = img * m
    b_j = jnp.asarray(b, jnp.float64)
    x0_j = jnp.asarray(x0, jnp.float64)

    for name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)] * 2:
        multigrid.PRECOND_DTYPE = dt
        res = multigrid.solve(
            b_j, m, x0=x0_j, tolerance=1e-6, refinement_steps=4,
            max_iterations=600, device_output=True,
        )
        _ = float(res.x.sum())
        times = []
        for _rep in range(3):
            t0 = time.perf_counter()
            res = multigrid.solve(
                b_j, m, x0=x0_j, tolerance=1e-6, refinement_steps=4,
                max_iterations=600, device_output=True,
            )
            _ = float(res.x.sum())
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: iters={res.iterations} times="
            + ",".join(f"{t:.3f}" for t in times)
            + f" rel={res.error:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
