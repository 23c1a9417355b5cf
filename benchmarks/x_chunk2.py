"""EXPERIMENT (round 4): multi-band chunks at full tile.

Bands in one chunk share the mask hierarchy AND the PCG while_loop: per
chunk-iteration the um/deg reads amortize and the fixed V-cycle transfer +
coarse costs are paid once. 13 bands as 7x2-band chunks = ~49 chunk
iterations instead of 91. Question: does a 2-band (or 3-band) chunk fit
16 GB HBM at 10980^2, and what is the wall-clock per band?

Run: python benchmarks/x_chunk2.py [--bands-per-chunk 2] [--bands 4]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bands-per-chunk", type=int, default=2)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models.fill import laplace_fill
    from roofline import make_mask

    h = w = args.size
    m_np = make_mask(h, w)
    rng = np.random.default_rng(0)
    img = (rng.random((args.bands, h, w), dtype=np.float32) * 10000).astype(
        np.uint16
    )
    m_j = jnp.asarray(m_np)
    float(m_j[::997, ::997].sum())

    sums = []

    def sink(s, e, chunk):
        sums.append(float(chunk[:, ::499, ::499].sum()))

    # warm: compile on the first run (same shapes as the timed one)
    stats = {}
    res = laplace_fill(
        img, m_j, tolerance=1e-6, band_sink=sink, stats=stats,
        max_chunk_elements=args.bands_per_chunk * h * w,
    )
    print(f"warm-up: iters={res.iterations} err={res.error:.2e} "
          f"solve_s={stats['solve_s']:.2f} transfer={stats['transfer_wait_s']:.2f}")

    sums.clear()
    stats = {}
    t0 = time.perf_counter()
    res = laplace_fill(
        img, m_j, tolerance=1e-6, band_sink=sink, stats=stats,
        max_chunk_elements=args.bands_per_chunk * h * w,
    )
    wall = time.perf_counter() - t0
    print(
        f"bands={args.bands} chunk={args.bands_per_chunk}: "
        f"iters={res.iterations} err={res.error:.2e} "
        f"solve_s={stats['solve_s']:.2f} transfer_wait={stats['transfer_wait_s']:.2f} "
        f"wall={wall:.2f} -> solve per band {stats['solve_s']/args.bands:.3f} s"
    )


if __name__ == "__main__":
    main()
