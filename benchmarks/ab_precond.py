"""A/B the V-cycle preconditioner dtype (bf16 vs f32) at full-tile scale."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import satellite_approximation_tpu  # noqa: F401
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.fill import (
        _residual_from_image,
        _x0_from_image,
    )
    import jax

    H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 10980
    rng = np.random.default_rng(0)
    yy, xx = np.ogrid[:H, :W]
    m = np.zeros((H, W), bool)
    for _ in range(60):
        cy, cx = rng.integers(200, H - 200), rng.integers(200, W - 200)
        ry, rx = rng.integers(30, 300), rng.integers(30, 300)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    img = rng.random((1, H, W), dtype=np.float32)

    img_j = jnp.asarray(img)
    m_j = jnp.asarray(m)
    deg_j = jax.jit(multigrid._neighbor_degree_traced, static_argnums=(0, 1))(H, W)
    levels_j = multigrid._device_hierarchy(m_j, deg_j)
    x64 = _x0_from_image(img_j, m_j)
    r64, rn, bn = _residual_from_image(img_j, x64, m_j, deg_j)
    r32 = r64.astype(jnp.float32)
    z32 = jnp.zeros(r32.shape, jnp.float32)
    rn0 = float(np.asarray(rn)[0])
    bn0 = float(np.asarray(bn)[0])
    print(f"initial rel resid {rn0 / bn0:.3e}", flush=True)

    for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        tol = jnp.asarray(5e-7, jnp.float32)
        # compile
        d, iters, rs = multigrid._pcg_run(
            r32, z32, tol, levels_j, max_iterations=100, precond_dtype=dt
        )
        _ = float(d.sum())
        t0 = time.perf_counter()
        d, iters, rs = multigrid._pcg_run(
            r32, z32, tol, levels_j, max_iterations=100, precond_dtype=dt
        )
        _ = float(d.sum())
        dtm = time.perf_counter() - t0
        print(
            f"{dt_name}: iters={int(iters)} time={dtm:.2f}s "
            f"({dtm / max(int(iters), 1):.3f}s/iter) relres={float(np.asarray(rs).max()):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
