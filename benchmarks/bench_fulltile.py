"""Full-tile fill benchmark (BASELINE config #4): 10980x10980 Sentinel-2
scale masked fill via band-chunked multigrid.

    python benchmarks/bench_fulltile.py [n_bands]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import satellite_approximation_tpu  # noqa: F401  (enables x64)
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import solve_banded_chunks
    import functools

    bands = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    H = W = 10980
    rng = np.random.default_rng(0)
    yy, xx = np.ogrid[:H, :W]
    m = np.zeros((H, W), bool)
    for _ in range(60):
        cy, cx = rng.integers(200, H - 200), rng.integers(200, W - 200)
        ry, rx = rng.integers(30, 300), rng.integers(30, 300)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False

    img = rng.random((bands, H, W), dtype=np.float32).astype(np.float64)
    known = img * (~m)
    p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
    b = (
        p[:, 0:H, 1 : W + 1] + p[:, 2 : H + 2, 1 : W + 1]
        + p[:, 1 : H + 1, 0:W] + p[:, 1 : H + 1, 2 : W + 2]
    ) * m

    solver = functools.partial(
        multigrid.solve, umask=m, tolerance=1e-6, refinement_steps=3,
        device_output=True,
    )
    # warmup single band (compile)
    r0 = solver(b[:1], x0=(img * m)[:1])
    _ = float(r0.x.sum())

    t0 = time.perf_counter()
    res = solve_banded_chunks(solver, b, x0=img * m)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "fulltile_fill_latency",
                "value": round(dt, 2),
                "unit": "s",
                "bands": bands,
                "masked_mpix_per_s": round(m.sum() * bands / dt / 1e6, 3),
                "iterations": res.iterations,
                "rel_residual": res.error,
            }
        )
    )


if __name__ == "__main__":
    main()
