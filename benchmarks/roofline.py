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

    # MEASUREMENT NOTE. On this remote runtime block_until_ready can return
    # before the device has executed (both earlier roofline artifacts showed
    # kernels "faster" than the HBM speed of light). Every row is therefore
    # timed by CHAINED k-DIFFERENCING: one jitted program applies the op k
    # times sequentially (each application consuming the previous output, so
    # nothing can be elided or overlapped) and returns a scalar sum whose
    # float() fetch is a genuine device sync; marginal seconds per
    # application = (t[k2] - t[k1]) / (k2 - k1), median over ``runs``.
    import functools
    from jax import lax

    def marginal_seconds(run, k1, k2, *extra, k2_cap=512):
        # everything device-sized rides as jit ARGUMENTS (closed-over
        # full-tile planes overflow the remote compiler's request limit)
        def timed(k):
            float(run(u, b, um_j, deg_j, *extra, k=k))  # compile + warm
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                float(run(u, b, um_j, deg_j, *extra, k=k))
                times.append(time.perf_counter() - t0)
            times.sort()
            return times[len(times) // 2], times[-1] - times[0]

        # Escalate k2 until the chain-length signal clears the dispatch
        # noise (tunnel RTT swings by tens of ms; a fast op at a small
        # shape needs hundreds of links before the gap is measurable —
        # without this the 2048^2 A-apply marginal underflowed to 0).
        med1, spread1 = timed(k1)
        while True:
            med2, spread2 = timed(k2)
            gap = med2 - med1
            noise = max(spread1, spread2, 0.020)
            if gap >= noise or k2 >= k2_cap:
                break
            k2 = min(k2 * 2, k2_cap)
        # cleared=False means even k2_cap chained applications stayed inside
        # the dispatch-noise floor — the marginal below is an upper-bound
        # estimate, not a bandwidth measurement, and the caller flags it.
        return max(gap / (k2 - k1), 1e-9), k2, gap >= noise

    k1, k2 = (4, 16) if max(h, w) <= 4096 else (2, 8)

    def flagged_row(name, sec, cleared, nbytes, note):
        r = rl.row(name, sec, nbytes, note=note)
        if not cleared:
            r.note += (
                "; UNRELIABLE: chain signal stayed under the dispatch-noise"
                " floor even at the k cap — upper-bound estimate"
            )
        if r.achieved_gbps > rl.hbm_peak_gbps():
            r.note += (
                "; exceeds the analytic HBM bound — operands stay"
                " VMEM-resident across the chained applies, so the marginal"
                " is compute-bound, not an HBM bandwidth measurement"
            )
        return r

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_smoother(u0, b_, um, dg, k):
        def body(i, x):
            return fused_jacobi_tpu(x, b_, um, dg, sweeps=6)
        return jnp.sum(lax.fori_loop(0, k, body, u0))

    sec, kf, ok = marginal_seconds(run_smoother, k1, k2)
    out.append(
        flagged_row(
            f"pallas_smoother_6sweeps_{h}x{w}x{channels}",
            sec, ok,
            rl.smoother_bytes(h, w, channels),
            note=f"6 VMEM-resident Jacobi sweeps, one HBM pass (k={k1}->{kf})",
        )
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_smooth_residual(u0, b_, um, dg, k):
        def body(i, x):
            x2, r = fused_jacobi_tpu(x, b_, um, dg, sweeps=6, emit_residual=True)
            # keep the residual output live (1e-30 never rounds the chain
            # off course; the extra fused add is noise next to the kernel)
            return x2 + jnp.float32(1e-30) * r
        return jnp.sum(lax.fori_loop(0, k, body, u0))

    sec, kf, ok = marginal_seconds(run_smooth_residual, k1, k2)
    out.append(
        flagged_row(
            f"pallas_smooth_residual_{h}x{w}x{channels}",
            sec, ok,
            rl.smoother_bytes(h, w, channels, emit_residual=True),
            note=f"pre-smooth + post-smooth residual in one pass (k={k1}->{kf})",
        )
    )

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_laplacian(u0, b_, um, dg, k):
        def body(i, x):
            # 0.125 folds into the stencil output (spectral radius <= 1:
            # the chain stays bounded over any k)
            return masked_laplacian(x, um, dg) * jnp.float32(0.125)
        return jnp.sum(lax.fori_loop(0, k, body, u0))

    sec, kf, ok = marginal_seconds(run_laplacian, k1, k2)
    out.append(
        flagged_row(
            f"masked_laplacian_{h}x{w}x{channels}",
            sec, ok,
            rl.laplacian_bytes(h, w, channels, 4),
            note=f"XLA fused 5-point stencil apply (k={k1}->{kf})",
        )
    )

    # one V-cycle. The cycle amplifies low modes (it approximates A^-1), so
    # the chain re-anchors each link on the original input with an
    # epsilon-coupling to the previous output — sequential, bounded.
    pdtype = multigrid._precond_dtype_for((h, w))
    dtype_bytes = 2 if pdtype == jnp.bfloat16 else 4
    levels_p = tuple((lm, ld.astype(pdtype)) for lm, ld in levels_j)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_vcycle(u0, b_, um, dg, lv, ci, k):
        def body(i, x):
            xin = (u0 + jnp.float32(1e-30) * x).astype(pdtype)
            return multigrid._v_cycle(
                lv, xin, jnp.zeros(xin.shape, pdtype), 0, ci
            ).astype(jnp.float32)
        return jnp.sum(lax.fori_loop(0, k, body, u0))

    sec, kf, ok = marginal_seconds(run_vcycle, k1, k2, levels_p, hier.coarse_inv)
    vbytes = rl.vcycle_bytes(shapes, channels, dtype_bytes)
    out.append(
        flagged_row(
            f"v_cycle_{h}x{w}x{channels}",
            sec, ok,
            vbytes,
            note=(
                f"{len(shapes)} levels, precond dtype "
                f"{np.dtype(pdtype).name} (k={k1}->{kf})"
            ),
        )
    )

    # marginal PCG iteration: the production while_loop body, k-differenced;
    # the returned residual norms are fetched (true sync)
    def run_pcg(u0, b_, um, dg, hr, k):
        x_, it, rn = multigrid._pcg_run(
            u0, jnp.zeros(u0.shape, jnp.float32),
            jnp.asarray(1e-30, jnp.float32), hr,
            max_iterations=k, precond_dtype=pdtype,
        )
        return jnp.sum(rn)

    kp1, kp2 = 2, 6
    sec, kpf, ok = marginal_seconds(run_pcg, kp1, kp2, hier, k2_cap=64)
    out.append(
        flagged_row(
            f"pcg_marginal_iteration_{h}x{w}x{channels}",
            sec, ok,
            rl.pcg_iteration_bytes(shapes, channels, 4, dtype_bytes),
            note=f"(t[{kpf} iters] - t[{kp1} iters]) / {kpf - kp1}",
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
