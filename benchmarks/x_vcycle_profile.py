"""EXPERIMENT: decompose the full-tile PCG iteration cost by stage.

The measured marginal PCG iteration at 10980^2 is ~91 ms/band (x_fulltile_refine),
~3x the analytic HBM traffic bound (~27 ms). Chained-differencing marginals for
each constituent at (C, N, N):

  1. fused Pallas smoother, 6 sweeps (pre-smooth unit, emit_residual=True)
  2. fused Pallas smoother, 6 sweeps, no residual (post-smooth unit)
  3. f32 A-apply + axpy (the CG body's matvec + vector update)
  4. restrict to N/2 + prolong back (the level-0 <-> level-1 glue)
  5. full V-cycle (precond application alone)
  6. CG vector algebra only (3 dots + 3 axpys, no matvec/precond)

Run: python benchmarks/x_vcycle_profile.py [--size 10980] [--channels 2]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def marginal(build_chained, k1=2, k2=8, runs=5):
    f1 = build_chained(k1)
    f2 = build_chained(k2)
    f1(); f2()
    t1s, t2s = [], []
    for _ in range(runs):
        t0 = time.perf_counter(); f1(); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); f2(); t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    ap.add_argument("--channels", type=int, default=2)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import neighbor_degree, masked_laplacian

    import jax
    import jax.numpy as jnp
    from jax import lax

    h = w = args.size
    c = args.channels
    rng = np.random.default_rng(0)
    m_np = np.zeros((h, w), bool)
    for _ in range(60):
        cy, cx = int(rng.integers(200, h - 200)), int(rng.integers(200, w - 200))
        ry = int(rng.integers(30, max(h // 36, 31)))
        rx = int(rng.integers(30, max(h // 36, 31)))
        y0, y1 = max(cy - ry, 0), min(cy + ry + 1, h)
        x0, x1 = max(cx - rx, 0), min(cx + rx + 1, w)
        yy = np.arange(y0, y1, dtype=np.float32)[:, None]
        xx = np.arange(x0, x1, dtype=np.float32)[None, :]
        m_np[y0:y1, x0:x1] |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m_np[0, :] = m_np[-1, :] = m_np[:, 0] = m_np[:, -1] = False

    deg = neighbor_degree((h, w))
    hier = multigrid._device_hierarchy(m_np, deg)
    um_j, deg_j = hier.levels[0]

    u0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    b0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    jax.block_until_ready((u0, b0))

    def sync(x):
        return float(jnp.sum(x[..., ::997, ::997]))

    def report(name, sec):
        gb = 0.0
        print(f"{name:54s} {sec*1e3:9.2f} ms", flush=True)

    from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu

    omegas = multigrid._smoother_omegas(multigrid._PRE_SMOOTH)

    # 1. fused smoother with residual (pre-smooth unit)
    @functools.partial(jax.jit, static_argnames=("k",))
    def smooth_resid_chain(u, b, um, deg, k):
        def body(_, u):
            u2, r = fused_jacobi_tpu(
                u, b, um, deg, sweeps=len(omegas), omega=omegas,
                emit_residual=True,
            )
            return u2 + 1e-30 * r
        return lax.fori_loop(0, k, body, u)

    report(
        f"pre-smooth unit (pallas {len(omegas)} sweeps + residual)",
        marginal(lambda k: (lambda: sync(smooth_resid_chain(u0, b0, um_j, deg_j, k=k)))),
    )

    # 2. fused smoother, no residual (post-smooth unit)
    @functools.partial(jax.jit, static_argnames=("k",))
    def smooth_chain(u, b, um, deg, k):
        def body(_, u):
            return fused_jacobi_tpu(
                u, b, um, deg, sweeps=len(omegas),
                omega=tuple(reversed(omegas)),
            )
        return lax.fori_loop(0, k, body, u)

    report(
        f"post-smooth unit (pallas {len(omegas)} sweeps)",
        marginal(lambda k: (lambda: sync(smooth_chain(u0, b0, um_j, deg_j, k=k)))),
    )

    # 3. A-apply + axpy (the CG matvec step)
    @functools.partial(jax.jit, static_argnames=("k",))
    def matvec_chain(p, um, deg, k):
        def body(_, p):
            ap = masked_laplacian(p, um, deg)
            return p + 1e-30 * ap
        return lax.fori_loop(0, k, body, p)

    report(
        "A-apply + axpy",
        marginal(lambda k: (lambda: sync(matvec_chain(u0, um_j, deg_j, k=k)))),
    )

    # 4. restrict + prolong round trip at level 0
    um1_j, _ = hier.levels[1]

    @functools.partial(jax.jit, static_argnames=("k",))
    def transfer_chain(r, um_c, k):
        def body(_, r):
            rc = multigrid._restrict(r) * um_c.astype(r.dtype)
            return r + 1e-30 * multigrid._prolong(rc, r.shape)
        return lax.fori_loop(0, k, body, r)

    report(
        "restrict + prolong (level 0 <-> 1)",
        marginal(lambda k: (lambda: sync(transfer_chain(u0, um1_j, k=k)))),
    )

    # 5. full V-cycle
    @functools.partial(jax.jit, static_argnames=("k",))
    def vcycle_chain(r, hier, k):
        levels = tuple((m_, d_.astype(jnp.float32)) for m_, d_ in hier.levels)

        def body(_, r):
            z = multigrid._v_cycle(
                levels, r, jnp.zeros_like(r), 0, hier.coarse_inv
            )
            return r + 1e-30 * z
        return lax.fori_loop(0, k, body, r)

    report(
        "full V-cycle",
        marginal(lambda k: (lambda: sync(vcycle_chain(u0, hier, k=k)))),
    )

    # 5b. full V-cycle with the padded-resident kernel path (what _pcg_core
    # actually runs: padded mask/deg built once outside the loop)
    @functools.partial(jax.jit, static_argnames=("k",))
    def vcycle_padded_chain(r, hier, k):
        levels = tuple((m_, d_.astype(jnp.float32)) for m_, d_ in hier.levels)
        pmd = multigrid._padded_md_for_levels(levels)

        def body(_, r):
            z = multigrid._v_cycle(
                levels, r, jnp.zeros_like(r), 0, hier.coarse_inv, pmd,
                u_is_zero=True,
            )
            return r + 1e-30 * z
        return lax.fori_loop(0, k, body, r)

    report(
        "full V-cycle (padded-resident, zero-start)",
        marginal(lambda k: (lambda: sync(vcycle_padded_chain(u0, hier, k=k)))),
    )

    # 6. CG vector algebra only (3 dots + 3 axpys)
    @functools.partial(jax.jit, static_argnames=("k",))
    def algebra_chain(x, r, p, k):
        def body(_, s):
            x, r, p = s
            rs = jnp.sum(r * r, axis=(-2, -1))
            pp = jnp.sum(p * p, axis=(-2, -1))
            alpha = (rs / (pp + 1.0))[..., None, None]
            x = x + alpha * p
            r = r - alpha * p
            rz = jnp.sum(r * x, axis=(-2, -1))
            p = r + (rz / (rs + 1.0))[..., None, None] * p
            return x, r, p
        x, r, p = lax.fori_loop(0, k, body, (x, r, p))
        return x + r + p

    report(
        "CG vector algebra (3 dots + 3 axpys)",
        marginal(lambda k: (lambda: sync(algebra_chain(u0, b0, u0 * 0.5, k=k)))),
    )


if __name__ == "__main__":
    main()
