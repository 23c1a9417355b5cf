"""A/B PRECOND_DTYPE on the full-tile laplace_fill (floored inner tol)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import satellite_approximation_tpu  # noqa: F401
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.fill import laplace_fill

    H = W = 10980
    rng = np.random.default_rng(0)
    yy, xx = np.ogrid[:H, :W]
    m = np.zeros((H, W), bool)
    for _ in range(60):
        cy, cx = rng.integers(200, H - 200), rng.integers(200, W - 200)
        ry, rx = rng.integers(30, 300), rng.integers(30, 300)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    img = jnp.asarray(rng.random((1, H, W), dtype=np.float32))
    m_j = jnp.asarray(m)

    for name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)] * 2:
        multigrid.PRECOND_DTYPE = dt
        r = laplace_fill(img, m_j, tolerance=1e-6, refinement_steps=3)
        _ = float(r.x.sum())
        t0 = time.perf_counter()
        r = laplace_fill(img, m_j, tolerance=1e-6, refinement_steps=3)
        _ = float(r.x.sum())
        dtm = time.perf_counter() - t0
        print(f"{name}: iters={r.iterations} time={dtm:.2f}s rel={r.error:.2e}", flush=True)


if __name__ == "__main__":
    main()
