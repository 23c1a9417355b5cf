"""Roofline telemetry run: achieved HBM GB/s for every solver hot kernel.

Emits JSON rows (utils/roofline.RooflineRow) for the fused Pallas smoother,
the smoother+residual variant, the fine A-apply, one V-cycle, and the
marginal MG-PCG iteration, at 2048^2 and (optionally) 10980^2 — the
hardware-normalized utilization artifact VERDICT round 2 asked for
(reference analog: PerfInfo wall-times, poisson.cpp:218-261).

Usage: python benchmarks/roofline.py [--full-tile] [--out results.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_mask(h, w, seed=3, n=40):
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), dtype=bool)
    yy, xx = np.ogrid[:h, :w]
    pad = min(40, h // 4, w // 4)
    for _ in range(n):
        cy, cx = r.integers(pad, h - pad), r.integers(pad, w - pad)
        ry, rx = r.integers(4, max(h // 24, 5)), r.integers(4, max(w // 24, 5))
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    return m


def rows_for(h, w, channels, runs=5):
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import masked_laplacian, neighbor_degree
    from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
    from satellite_approximation_tpu.utils import roofline as rl

    m = make_mask(h, w)
    deg = neighbor_degree((h, w))
    hier = multigrid._device_hierarchy(m, deg)
    levels_j = hier.levels
    um_j, deg_j = levels_j[0]
    shapes = [tuple(lm.shape) for lm, _ in levels_j]

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((channels, h, w), dtype=np.float32))
    b = jnp.asarray(rng.random((channels, h, w), dtype=np.float32))
    jax.block_until_ready((u, b))

    out = []

    # fused Pallas smoother, 6 sweeps
    fn = lambda: jax.block_until_ready(
        fused_jacobi_tpu(u, b, um_j, deg_j, sweeps=6)
    )
    sec = rl.measure(fn, n=runs)
    out.append(
        rl.row(
            f"pallas_smoother_6sweeps_{h}x{w}x{channels}",
            sec,
            rl.smoother_bytes(h, w, channels),
            note="6 VMEM-resident Jacobi sweeps, one HBM pass",
        )
    )

    # fused smoother + residual
    fn = lambda: jax.block_until_ready(
        fused_jacobi_tpu(u, b, um_j, deg_j, sweeps=6, emit_residual=True)
    )
    sec = rl.measure(fn, n=runs)
    out.append(
        rl.row(
            f"pallas_smooth_residual_{h}x{w}x{channels}",
            sec,
            rl.smoother_bytes(h, w, channels, emit_residual=True),
            note="pre-smooth + post-smooth residual in one pass",
        )
    )

    # fine A-apply (XLA)
    ml = jax.jit(lambda p: masked_laplacian(p, um_j, deg_j))
    fn = lambda: jax.block_until_ready(ml(u))
    sec = rl.measure(fn, n=runs)
    out.append(
        rl.row(
            f"masked_laplacian_{h}x{w}x{channels}",
            sec,
            rl.laplacian_bytes(h, w, channels, 4),
            note="XLA fused 5-point stencil apply",
        )
    )

    # one V-cycle (jitted standalone)
    pdtype = multigrid._precond_dtype_for((h, w))
    dtype_bytes = 2 if pdtype == jnp.bfloat16 else 4
    levels_p = tuple((lm, ld.astype(pdtype)) for lm, ld in levels_j)
    vc = jax.jit(
        lambda r: multigrid._v_cycle(
            levels_p, r.astype(pdtype), jnp.zeros(r.shape, pdtype), 0,
            hier.coarse_inv,
        )
    )
    fn = lambda: jax.block_until_ready(vc(u))
    sec = rl.measure(fn, n=runs)
    vbytes = rl.vcycle_bytes(shapes, channels, dtype_bytes)
    out.append(
        rl.row(
            f"v_cycle_{h}x{w}x{channels}",
            sec,
            vbytes,
            note=f"{len(shapes)} levels, precond dtype {np.dtype(pdtype).name}",
        )
    )

    # marginal PCG iteration: (time(k2 iters) - time(k1 iters)) / (k2 - k1)
    r32 = u
    z32 = jnp.zeros(r32.shape, jnp.float32)

    def pcg(n):
        return jax.block_until_ready(
            multigrid._pcg_run(
                r32, z32, jnp.asarray(1e-30, jnp.float32), hier,
                max_iterations=n, precond_dtype=pdtype,
            )
        )

    k1, k2 = 2, 6
    pcg(k1)  # compile both specializations
    pcg(k2)
    t1 = rl.measure(lambda: pcg(k1), n=runs)
    t2 = rl.measure(lambda: pcg(k2), n=runs)
    marginal = max((t2 - t1) / (k2 - k1), 1e-9)
    out.append(
        rl.row(
            f"pcg_marginal_iteration_{h}x{w}x{channels}",
            marginal,
            rl.pcg_iteration_bytes(shapes, channels, 4, dtype_bytes),
            note=f"(t[{k2} iters] - t[{k1} iters]) / {k2 - k1}",
        )
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-tile", action="store_true")
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)
    t0 = time.perf_counter()
    rows = rows_for(2048, 2048, args.channels, runs=args.runs)
    if args.full_tile:
        rows += rows_for(10980, 10980, args.channels, runs=max(args.runs - 2, 3))
    payload = {
        "device": jax.devices()[0].device_kind,
        "peak_hbm_gbps": __import__(
            "satellite_approximation_tpu.utils.roofline", fromlist=["x"]
        ).hbm_peak_gbps(),
        "rows": [r.to_json() for r in rows],
        "elapsed_s": round(time.perf_counter() - t0, 1),
    }
    text = json.dumps(payload, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
