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
