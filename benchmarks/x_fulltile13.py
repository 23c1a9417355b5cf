"""EXPERIMENT (round 5): 13-band full-tile chip-side solve time, data
GENERATED ON DEVICE (zero ingest — isolates the chip figure from this
host's ~25 MB/s tunnel). A/Bs the round-5 levers:

  * chunk bands: 1 vs 2 (fixed-cost amortization; fill.FILL_CHUNK_ELEMENTS)
  * refinement floor: INNER_TOL_FLOOR 1e-4 (two passes) vs 3e-7 (one pass)

Run: python benchmarks/x_fulltile13.py [--size 10980] [--bands 13]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from roofline import make_mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    ap.add_argument("--bands", type=int, default=13)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import fill as F
    from satellite_approximation_tpu.models import multigrid as M

    h = w = args.size
    c = args.bands
    m_np = make_mask(h, w)
    masked = int(m_np.sum())
    umask_j = jnp.asarray(m_np)
    float(umask_j[::499, ::499].sum())

    @jax.jit
    def gen(key):
        # u16-valued bands, Sentinel-2-like dynamic range, device-resident
        return (
            jax.random.uniform(key, (c, h, w), jnp.float32, 0.0, 10000.0)
        ).astype(jnp.uint16)

    img = gen(jax.random.PRNGKey(0))
    float(img[0, ::499, ::499].sum())

    def run(tag, chunk_elems, floor):
        # the f32-preconditioner path reads INNER_TOL_FLOOR_F32 (the bf16
        # path keeps INNER_TOL_FLOOR); patch both so the A/B hits whichever
        # is live for this grid size
        old_floor = M.INNER_TOL_FLOOR
        old_floor32 = M.INNER_TOL_FLOOR_F32
        M.INNER_TOL_FLOOR = floor
        M.INNER_TOL_FLOOR_F32 = floor
        F._fused_refine_solve.clear_cache()
        try:
            sums = []

            def sink(s, e, chunk):
                sums.append(chunk.sum())

            stats = {}
            # warmup/compile on the first chunk shape
            r0 = F.laplace_fill(
                img[:1], umask_j, tolerance=1e-6, refinement_steps=3,
                max_chunk_elements=chunk_elems,
            )
            float(r0.x.sum())
            del r0

            t0 = time.perf_counter()
            res = F.laplace_fill(
                img, umask_j, tolerance=1e-6, refinement_steps=3,
                band_sink=sink, stats=stats, max_chunk_elements=chunk_elems,
            )
            vals = [float(v) for v in sums]
            dt = time.perf_counter() - t0
            assert all(np.isfinite(vals)), vals
            print(
                f"{tag}: total {dt:6.2f}s solve_s {stats['solve_s']:6.2f}s "
                f"iters {res.iterations} rel {res.error:.2e} "
                f"({masked * c / dt / 1e6:.2f} Mpix/s)",
                flush=True,
            )
        finally:
            M.INNER_TOL_FLOOR = old_floor
            M.INNER_TOL_FLOOR_F32 = old_floor32
            F._fused_refine_solve.clear_cache()

    one = h * w
    # 2-band chunks: NEGATIVE result (kept in the log for the record) —
    # every per-chunk cost is bandwidth-bound per band, iteration counts
    # are band-max not shared, and the 2-band 10980^2 state OOMs the chip.
    run("1-band chunks, floor 1e-4", one, 1e-4)
    run("1-band chunks, floor 3e-7", one, 3e-7)


if __name__ == "__main__":
    main()
