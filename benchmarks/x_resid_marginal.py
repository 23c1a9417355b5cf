"""EXPERIMENT (round 4): marginal cost of the double-float residual
cascade + bnorm at full tile, with all operands as jit args (no closure
constants -> no remote-compile 413).

The fixed non-PCG cost of a full-tile band solve is ~196 ms (x_solve_split:
548 total - 7 x 50.3 iteration). The candidates are the exact TwoSum
cascade residual (fill.residual, ~2 evals/solve), bnorm, assembly, and
composite. This measures each by chained differencing.

Run: python benchmarks/x_resid_marginal.py [--size 10980]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from roofline import make_mask


def marginal(fn, k1, k2, reps=3):
    float(fn(k1))
    float(fn(k2))
    ts1, ts2 = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn(k1)); ts1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fn(k2)); ts2.append(time.perf_counter() - t0)
    ts1.sort(); ts2.sort()
    return (ts2[len(ts2) // 2] - ts1[len(ts1) // 2]) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.fill import (
        _cascade, _shift_taps, _norm64, _two_sum,
    )

    h = w = args.size
    m_np = make_mask(h, w)
    umask_j = jnp.asarray(m_np)
    deg_j = jax.jit(
        multigrid._neighbor_degree_traced, static_argnums=(0, 1)
    )(h, w)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    float(img.sum())

    @jax.jit
    def resid_chain(k, img32, umask, deg):
        umf = umask.astype(jnp.float32)
        kk = (4.0 - deg.astype(jnp.float32)) * umf
        known = img32 * (1.0 - umf)
        x_hi0 = img32 * umf
        x_lo0 = jnp.zeros_like(x_hi0)

        def body(i, st):
            x_hi, x_lo = st
            y_hi = known + x_hi
            hi_terms = list(_shift_taps(y_hi)) + [-4.0 * x_hi, kk * x_hi]
            s, c = _cascade(hi_terms)
            l1, l2, l3, l4 = _shift_taps(x_lo)
            lo = l1 + l2 + l3 + l4 - 4.0 * x_lo + kk * x_lo
            r = (s + (c + lo)) * umf
            rn = _norm64(r).astype(jnp.float32)
            return (x_hi + (1e-30 * rn)[..., None, None], x_lo)

        x_hi, _ = lax.fori_loop(0, k, body, (x_hi0, x_lo0))
        return x_hi.sum()

    sec = marginal(lambda k: resid_chain(jnp.int32(k), img, umask_j, deg_j), 2, 8)
    print(f"marginal cascade residual  {sec*1e3:9.2f} ms", flush=True)

    @jax.jit
    def bnorm_chain(k, img32, umask, deg):
        umf = umask.astype(jnp.float32)
        known = img32 * (1.0 - umf)

        def body(i, acc):
            s, c = _cascade(list(_shift_taps(known + acc * 1e-30)))
            return acc + _norm64((s + c) * umf).sum()

        return lax.fori_loop(0, k, body, jnp.float64(0.0))

    sec = marginal(lambda k: bnorm_chain(jnp.int32(k), img, umask_j, deg_j), 2, 8)
    print(f"marginal bnorm cascade     {sec*1e3:9.2f} ms", flush=True)

    @jax.jit
    def bnorm32_chain(k, img32, umask):
        umf = umask.astype(jnp.float32)
        known = img32 * (1.0 - umf)
        from satellite_approximation_tpu.models.cg import shift_sum

        def body(i, acc):
            b = shift_sum(known + acc * 1e-30) * umf
            return acc + _norm64(b).sum()

        return lax.fori_loop(0, k, body, jnp.float64(0.0))

    sec = marginal(lambda k: bnorm32_chain(jnp.int32(k), img, umask_j), 2, 8)
    print(f"marginal bnorm plain f32   {sec*1e3:9.2f} ms", flush=True)

    # TwoSum accumulate (x_hi, e) = two_sum(x_hi, d*umf); x_lo += e
    d32 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))

    @jax.jit
    def accum_chain(k, d, umask):
        umf = umask.astype(jnp.float32)

        def body(i, st):
            x_hi, x_lo = st
            x_hi, e = _two_sum(x_hi, d * umf * (1e-30 * (i + 1)))
            return (x_hi, x_lo + e)

        x_hi, x_lo = lax.fori_loop(0, k, body, (d, jnp.zeros_like(d)))
        return x_hi.sum() + x_lo.sum()

    sec = marginal(lambda k: accum_chain(jnp.int32(k), d32, umask_j), 2, 10)
    print(f"marginal twosum accumulate {sec*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
