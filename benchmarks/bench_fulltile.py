"""Full-tile fill benchmark (BASELINE config #4): 10980x10980 Sentinel-2
scale masked fill via the device-first laplace_fill path.

    python benchmarks/bench_fulltile.py [n_bands]

Reports ingest (H2D over the tunnel; on a real TPU VM this is PCIe) and
solve separately — the solve number is the hardware capability, the ingest
number is this host's tunnel bandwidth.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import satellite_approximation_tpu  # noqa: F401  (enables x64)
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models.fill import laplace_fill

    bands = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    # --resident: pre-upload ALL bands (f32) so the solve loop runs with
    # zero transfer waits — the clean chip-side figure (a 13-band f32 tile
    # is 6.3 GB; with ~3 GB solver state it fits a 16 GB chip)
    resident = "--resident" in sys.argv
    H = W = 10980
    rng = np.random.default_rng(0)
    yy, xx = np.ogrid[:H, :W]
    m = np.zeros((H, W), bool)
    for _ in range(60):
        cy, cx = rng.integers(200, H - 200), rng.integers(200, W - 200)
        ry, rx = rng.integers(30, 300), rng.integers(30, 300)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    # u16, like real Sentinel-2 L2A rasters: uploads in the integer dtype
    # (half the H2D bytes of f32) and casts on device
    img = (rng.random((bands, H, W), dtype=np.float32) * 10000).astype(np.uint16)

    # single band: pre-upload (fits easily). Multi-band: the image stays on
    # the host; laplace_fill streams chunk uploads with one-ahead prefetch
    # and reports transfer-wait vs solve time separately (this host's
    # tunnel H2D is ~10-45 MB/s; a real TPU VM's PCIe makes it negligible).
    t0 = time.perf_counter()
    if bands == 1:
        img = jnp.asarray(img)  # u16 upload (half the bytes), f32 cast on device
        _ = float(img[:, ::997, ::997].sum())
    elif resident:
        # u16 across the link, one on-device f32 cast; the u16 copy is
        # dropped so only the f32 stack (6.3 GB at 13 bands) stays resident
        img = jnp.asarray(img).astype(jnp.float32)
        _ = float(img[:, ::997, ::997].sum())
    m_j = jnp.asarray(m)
    _ = float(m_j[::997, ::997].sum())
    ingest = time.perf_counter() - t0

    # warmup: compile all executables on band 0 (compile cache persists)
    r0 = laplace_fill(img[:1], m_j, tolerance=1e-6, refinement_steps=3)
    _ = float(r0.x.sum())
    del r0

    # multi-band workloads stream each filled band to a consumer — one
    # chip's HBM can't hold a 13-band f32 output plus solver state. The
    # sink reduces to per-band checksums; the sums stay device scalars so
    # the sink never blocks the dispatch pipeline (floated at the end).
    sums = []

    def sink(s, e, chunk):
        sums.append(chunk.sum())

    stats = {}
    t0 = time.perf_counter()
    res = laplace_fill(
        img, m_j, tolerance=1e-6, refinement_steps=3,
        band_sink=sink if bands > 1 else None, stats=stats,
    )
    if res.x is not None:
        _ = float(res.x.sum())  # device sync (block_until_ready unreliable on axon)
    sums = [float(v) for v in sums]
    dt = time.perf_counter() - t0
    assert bands == 1 or (len(sums) == bands and all(np.isfinite(sums)))
    print(
        json.dumps(
            {
                "metric": "fulltile_fill_latency",
                "value": round(dt, 2),
                "unit": "s",
                "bands": bands,
                "resident": resident,
                "ingest_s": round(ingest, 2),
                "solve_s": round(stats.get("solve_s", dt), 2),
                "transfer_wait_s": round(stats.get("transfer_wait_s", 0.0), 2),
                "masked_mpix_per_s": round(m.sum() * bands / dt / 1e6, 3),
                "solve_mpix_per_s": round(
                    m.sum() * bands / max(stats.get("solve_s", dt), 1e-9) / 1e6, 3
                ),
                "iterations": res.iterations,
                "rel_residual": res.error,
                "note": (
                    "ingest_s/transfer_wait_s ride this host's ~25 MB/s TPU "
                    "tunnel; on a TPU VM (PCIe) they vanish — solve_s is the "
                    "chip-side figure"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
