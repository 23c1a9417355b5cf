"""Headline benchmark: masked Mpix/s filled to 1e-6 residual.

Config #4 analog from BASELINE.md: batched 13-band Poisson-style masked
fill of a 2048x2048 tile with a synthetic cloud mask, solved by the
matrix-free CG kernel on the default JAX device (TPU when available).
``vs_baseline`` is the speedup over the reference-style solver: scipy's
sparse CG at the same 1e-6 tolerance on the identically assembled system
(the closest available stand-in for the reference's Eigen CG path,
poisson.cpp:203-257 — no GPU/TPU, explicit sparse matrix).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


H = W = 2048
BANDS = 13
TOL = 1e-6


def make_mask(h, w, seed=3):
    """Synthetic cloud field: union of ellipses, ~8-12% coverage."""
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), dtype=bool)
    yy, xx = np.ogrid[:h, :w]
    for _ in range(40):
        cy, cx = r.integers(40, h - 40), r.integers(40, w - 40)
        ry, rx = r.integers(8, h // 24), r.integers(8, w // 24)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    return m


def smooth(h, w, seed):
    r = np.random.default_rng(seed)
    x = r.random((h, w), dtype=np.float32)
    for _ in range(4):
        x = 0.25 * (np.roll(x, 1, 0) + np.roll(x, -1, 0) + np.roll(x, 1, 1) + np.roll(x, -1, 1))
    return x


def bench_ours(b, umask, deg, x0):
    """Honest end-to-end wall time of the public solve path (f32 CG +
    f64 refinement) to a VERIFIED 1e-6 relative residual."""
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid

    # pre-upload once: the tunnel H2D would otherwise dominate the timing
    b = jnp.asarray(b, jnp.float64)
    x0 = jnp.asarray(x0, jnp.float64)

    def solve_once():
        # device_output avoids fetching the 436MB result over the (slow)
        # TPU tunnel; the verified f64 residual 'error' comes from
        # device-computed norms either way.
        res = multigrid.solve(
            b, umask, deg=deg, x0=x0, tolerance=TOL, refinement_steps=4,
            device_output=True,
        )
        res.x.block_until_ready()
        return res

    solve_once()  # warmup/compile
    # median-of-5: the tunneled-TPU runtime shows ±20-50% run-to-run latency
    # noise; the median is robust to a single slow (or lucky) run, and the
    # full spread is reported so round-over-round deltas can be judged
    # against the noise floor
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = solve_once()
        times.append(time.perf_counter() - t0)
    assert res.error <= TOL * 1.01, f"residual {res.error} missed tolerance"
    times.sort()
    return times, res.iterations, res.error


def bench_scipy(b, umask, deg, tol=TOL):
    """Reference-style path: explicit sparse matrix + scipy CG @ ``tol``,
    sequential per band (the reference solves channels in a loop)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    h, w = umask.shape
    idx = -np.ones((h, w), dtype=np.int64)
    ys, xs = np.nonzero(umask)
    n = len(ys)
    idx[ys, xs] = np.arange(n)

    rows, cols, vals = [], [], []
    rows.append(np.arange(n)); cols.append(np.arange(n)); vals.append(deg[ys, xs].astype(np.float64))
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        y2, x2 = ys + dy, xs + dx
        ok = (y2 >= 0) & (y2 < h) & (x2 >= 0) & (x2 < w)
        ok &= umask[np.clip(y2, 0, h - 1), np.clip(x2, 0, w - 1)]
        rows.append(idx[ys[ok], xs[ok]])
        cols.append(idx[y2[ok], x2[ok]])
        vals.append(np.full(ok.sum(), -1.0))
    A = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))), shape=(n, n)
    )

    t0 = time.perf_counter()
    for c in range(b.shape[0]):
        rhs = b[c][ys, xs].astype(np.float64)
        x, info = spla.cg(A, rhs, rtol=tol, maxiter=20000)
    dt = time.perf_counter() - t0
    return dt


def pallas_parity():
    """Chip-gated Mosaic-kernel parity certification, folded into the bench
    artifact (VERDICT r3 item 4): every BENCH_r*.json now implicitly
    certifies the production Pallas kernels and the grid-transfer lowerings
    on the real chip. Compact by design (the full tests/test_pallas.py run
    is ~11 min on the tunnel); covers the three hazard classes found so
    far: smoother-vs-XLA drift, zero-start/padded bitwise equivalence, and
    the round-3 reduce_window TRANSFER MISCOMPILE (exact at eager, wrong
    under jit at coarse sizes >= 512^2 — see test_pallas.TestTransferLowering).

    Returns "ok", "skipped (<backend>)", or "FAIL: <what>". Comparisons
    reduce to scalars on device — nothing big crosses the tunnel.
    """
    import jax

    if jax.default_backend() != "tpu":
        return f"skipped ({jax.default_backend()})"
    import jax.numpy as jnp
    from jax import lax

    from satellite_approximation_tpu.models.cg import masked_laplacian, neighbor_degree
    from satellite_approximation_tpu.models.multigrid import _prolong, _restrict
    from satellite_approximation_tpu.ops.pallas_kernels import (
        fused_jacobi_tpu,
        fused_jacobi_zero_tpu,
    )

    rng = np.random.default_rng(42)
    try:
        # 1) fused smoother vs the XLA reference loop (tolerance parity)
        c, h, w = 2, 600, 700
        u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        inv = jnp.where(dg > 0, 1.0 / dg, 0.0)

        def body(_, uu):
            au = masked_laplacian(uu, um, dg)
            return uu + 0.8 * (b - au) * inv * um.astype(uu.dtype)

        want_u = lax.fori_loop(0, 6, body, u)
        want_r = (b - masked_laplacian(want_u, um, dg)) * um.astype(u.dtype)
        got_u, got_r = fused_jacobi_tpu(
            u, b, um, dg, sweeps=6, omega=0.8, emit_residual=True
        )
        if float(jnp.max(jnp.abs(got_u - want_u))) > 5e-6:
            return "FAIL: fused_jacobi u drift vs XLA"
        if float(jnp.max(jnp.abs(got_r - want_r))) > 5e-5:
            return "FAIL: fused_jacobi residual drift vs XLA"

        # 2) zero-start kernel bitwise == general kernel at u=0
        omegas = (0.9, 0.7, 0.8, 1.1, 0.6, 0.75)
        wz_u, wz_r = fused_jacobi_tpu(
            jnp.zeros_like(b), b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        gz_u, gz_r = fused_jacobi_zero_tpu(
            b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        if not (bool(jnp.array_equal(gz_u, wz_u)) and bool(jnp.array_equal(gz_r, wz_r))):
            return "FAIL: zero-start kernel not bitwise-equal to general"

        # 3) transfer-lowering pins at the miscompile sizes (round-3 bug:
        # wrong jit values at coarse sizes >= 512^2 — these sizes hit it)
        r2 = jnp.asarray(rng.random((1, 1373, 1373), dtype=np.float32))
        got = jax.jit(_restrict)(r2)
        r2p = jnp.pad(r2, ((0, 0), (0, 1), (0, 1)))
        rows = r2p[:, 0::2, :] + r2p[:, 1::2, :]
        want = rows[:, :, 0::2] + rows[:, :, 1::2]
        if not bool(jnp.array_equal(got, want)):
            return "FAIL: _restrict lowering at 1373^2"
        e = jnp.asarray(rng.random((1, 687, 687), dtype=np.float32))
        fine = (1, 1373, 1374)
        got_p = jax.jit(_prolong, static_argnums=1)(e, fine)
        want_p = jnp.repeat(jnp.repeat(e, 2, axis=1), 2, axis=2)[:, :1373, :1374]
        if not bool(jnp.array_equal(got_p, want_p)):
            return "FAIL: _prolong lowering at 687^2"
    except Exception as e:  # noqa: BLE001
        return f"FAIL: exception {type(e).__name__}: {e}"
    return "ok"


def main():
    umask = make_mask(H, W)
    deg = np.full((H, W), 4.0, dtype=np.float32)
    deg[0, :] -= 1; deg[-1, :] -= 1; deg[:, 0] -= 1; deg[:, -1] -= 1

    imgs = np.stack([smooth(H, W, s) for s in range(BANDS)])
    known = imgs * (~umask)
    p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
    b = (
        p[:, 0:H, 1 : W + 1] + p[:, 2 : H + 2, 1 : W + 1]
        + p[:, 1 : H + 1, 0:W] + p[:, 1 : H + 1, 2 : W + 2]
    ) * umask
    x0 = imgs * umask

    n_masked = int(umask.sum()) * BANDS
    times, iters, rel = bench_ours(b, umask, deg, x0)
    ours_dt = times[len(times) // 2]  # median
    ours_mpix_s = n_masked / ours_dt / 1e6

    # baseline on ALL bands: per-band CG iteration counts vary enough with
    # the RHS (measured cv 38%) that a 3-band extrapolation overestimated
    # the baseline time by ~40% — the full run costs ~90 s and removes the
    # extrapolation caveat entirely
    scipy_dt = bench_scipy(b, umask, deg)
    scipy_mpix_s = n_masked / scipy_dt / 1e6

    parity = pallas_parity()

    print(
        json.dumps(
            {
                "metric": "masked_fill_throughput_13band_2048",
                "value": round(ours_mpix_s, 3),
                "unit": "Mpix/s@1e-6",
                "vs_baseline": round(ours_mpix_s / scipy_mpix_s, 3),
                "runs": {
                    "n": len(times),
                    "min_s": round(times[0], 3),
                    "median_s": round(ours_dt, 3),
                    "max_s": round(times[-1], 3),
                },
                "baseline_note": f"scipy CG timed on all {BANDS} bands (no extrapolation)",
                "pallas_parity": parity,
            }
        )
    )
    print(
        f"# ours: median {ours_dt:.3f}s of {times} ({iters} iters, max rel "
        f"resid {rel:.2e}); "
        f"scipy-CG baseline: {scipy_dt:.1f}s ({scipy_mpix_s:.2f} Mpix/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # the tunneled TPU in this environment occasionally drops a claim
        # mid-run; one retry rides it out
        print(f"# first attempt failed ({e}); retrying once", file=sys.stderr)
        main()
