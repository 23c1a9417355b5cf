"""EXPERIMENT (round 4): attribute the full-tile per-band solve overhead.

NOTES_ROUND3 §20: 1-band full-tile solve 0.83 s with 7 PCG iterations at a
66.5 ms marginal -> ~0.37 s/band is NOT PCG iterations. This measures the
non-PCG components of _fused_refine_solve separately (warm, chained):

    pcg        : _pcg_core alone on the premade f32 residual system
    residual64 : one f64 b-rebuild + residual + norms pass (x3-4 per band)
    prep       : x0/b-norm/f64-init prologue
    fused      : the whole _fused_refine_solve (what laplace_fill runs)

Run: python benchmarks/x_overhead.py [--size 10980]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timed(label, fn, runs=3):
    fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"{label:44s} {med*1e3:9.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models import fill as F
    from satellite_approximation_tpu.models.cg import neighbor_degree, shift_sum
    from roofline import make_mask

    h = w = args.size
    m_np = make_mask(h, w)
    deg_np = neighbor_degree((h, w))
    rng = np.random.default_rng(0)
    img_np = (rng.random((1, h, w), dtype=np.float32) * 10000).astype(np.uint16)

    img = jnp.asarray(img_np)
    umask = jnp.asarray(m_np)
    deg = jnp.asarray(deg_np)
    float(img.sum())

    hier = multigrid._device_hierarchy(umask, deg)
    pdtype = multigrid._precond_dtype_for((h, w))

    # --- the fused whole-solve, as laplace_fill dispatches it ---
    def fused():
        x_hi, x_lo, iters, rnorm, bnorm = F._fused_refine_solve(
            img, img, umask, deg, hier.levels, jnp.float64(1e-6),
            max_iterations=200, refinement_steps=3,
            precond_dtype=pdtype, use_multigrid=True, mode="laplace",
        )
        it, rn = jax.device_get((iters, rnorm))
        fused.iters = int(it)
        return float(rn[0])

    t_fused = timed("fused refine+solve (laplace_fill core)", fused)
    print(f"    total PCG iterations inside: {fused.iters}")

    # --- the inner PCG alone, on the system the first refinement pass sees ---
    um64 = umask.astype(jnp.float64)

    @jax.jit
    def first_resid(img, umask, deg):
        um64 = umask.astype(jnp.float64)
        img64 = img.astype(jnp.float64)
        b64 = shift_sum(img64 * (1.0 - um64)) * um64
        x64 = img64 * um64
        ax = (deg.astype(jnp.float64) * x64 - shift_sum(x64)) * um64
        r = (b64 - ax) * um64
        return r.astype(jnp.float32), jnp.sqrt(jnp.sum(r * r)), jnp.sqrt(jnp.sum(b64 * b64))

    r32, rn0, bn0 = first_resid(img, umask, deg)
    r32 = jax.block_until_ready(r32)
    needed = float(1e-6 * bn0 / rn0)
    inner_tol = float(np.clip(0.5 * needed, multigrid.INNER_TOL_FLOOR, 0.5))
    print(f"    first-pass inner_tol: {inner_tol:.2e}")

    @jax.jit
    def pcg_jit(b, tol, levels, cinv):
        return multigrid._pcg_core(
            b, jnp.zeros_like(b), tol, levels,
            max_iterations=200, precond_dtype=pdtype,
            coarse_inv=cinv,
        )

    def pcg():
        x, it, rr = pcg_jit(r32, jnp.float32(inner_tol), hier.levels, hier.coarse_inv)
        itv, rrv = jax.device_get((it, rr))
        pcg.iters = int(itv)
        return float(rrv[0])

    t_pcg = timed("inner PCG alone (first refinement pass)", pcg)
    print(f"    PCG iterations: {pcg.iters}")

    # --- one f64 residual/assembly pass ---
    def resid():
        r, rn, bn = first_resid(img, umask, deg)
        return float(jax.device_get(rn))

    t_resid = timed("f64 b-rebuild + residual + norms (x1)", resid)

    # --- f32 variant of the same residual pass (the potential saving) ---
    @jax.jit
    def resid32_f(img, umask, deg):
        umf = umask.astype(jnp.float32)
        img32 = img.astype(jnp.float32)
        b = shift_sum(img32 * (1.0 - umf)) * umf
        x = img32 * umf
        ax = (deg * x - shift_sum(x)) * umf
        r = (b - ax) * umf
        return r, jnp.sqrt(jnp.sum(r * r))

    def resid32():
        r, rn = resid32_f(img, umask, deg)
        return float(jax.device_get(rn))

    t_resid32 = timed("f32 variant of that pass", resid32)

    # --- composite (the per-chunk epilogue) ---
    x_hi_fake = img.astype(jnp.float32) * umask
    x_lo_fake = jnp.zeros_like(x_hi_fake)
    x_hi_fake = jax.block_until_ready(x_hi_fake)

    def comp():
        out = F._composite(img, x_hi_fake, x_lo_fake, umask)
        return float(out[0, ::997, ::997].sum())

    t_comp = timed("composite + checksum fetch", comp)

    n_resid = 3  # initial + per-refinement-step (typically 2 passes)
    accounted = t_pcg + n_resid * t_resid + t_comp
    print(f"\nfused total      : {t_fused*1e3:9.1f} ms")
    print(f"accounted (pcg + {n_resid}x resid + comp): {accounted*1e3:9.1f} ms")
    print(f"unaccounted      : {(t_fused - t_pcg - n_resid*t_resid)*1e3:9.1f} ms")
    print(f"potential f64->f32 residual saving: {n_resid*(t_resid-t_resid32)*1e3:9.1f} ms/band")


if __name__ == "__main__":
    main()
