"""EXPERIMENT (round 4): double-float (compensated f32) residual pass vs f64.

x_overhead.py showed the f64 b-rebuild+residual pass costs 203 ms/eval at
10980^2 (f64 is software-emulated on TPU) vs 45 ms for plain f32 — and the
fused solve runs it 3-4x per band. Plain f32 can't verify a 1e-6 residual
(cancellation), but an error-free TwoSum cascade over the 6 stencil terms
gives ~2^-48 effective precision at f32 speed.

Identity used: r = (S(known + x_hi) - deg*x_hi  [exact cascade]
                    + S(x_lo) - deg*x_lo        [plain f32, eps^2-level]) * um
with deg*x split as 4*x - k*x (k = 4-deg in {0,1,2}), both products exact.

Measures: accuracy vs the f64 oracle at 4096^2, wall time at 10980^2.
Run: python benchmarks/x_dfloat.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def shift_taps(x):
    h, w = x.shape[-2], x.shape[-1]
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    return (
        p[..., 0:h, 1 : w + 1],
        p[..., 2 : h + 2, 1 : w + 1],
        p[..., 1 : h + 1, 0:w],
        p[..., 1 : h + 1, 2 : w + 2],
    )


def residual_dfloat(img32, x_hi, x_lo, umask, deg):
    """r_hi (f32, ~2^-48-accurate) + ||r||, ||b|| for the Laplace system."""
    umf = umask.astype(jnp.float32)
    known = img32.astype(jnp.float32) * (1.0 - umf)
    y_hi = known + x_hi  # disjoint supports: exact
    k = (4.0 - deg) * umf  # in {0,1,2} on unknowns: k*x exact? (k*x_hi NOT exact for k=3... deg>=2 so k<=2; *2 exact, *1 exact, *0 exact)
    t1, t2, t3, t4 = shift_taps(y_hi)
    # exact cascade over the 6 hi terms
    s, c = two_sum(t1, t2)
    for t in (t3, t4, -4.0 * x_hi, k * x_hi):
        s, e = two_sum(s, t)
        c = c + e
    # lo terms in plain f32 (eps^2-level contribution)
    l1, l2, l3, l4 = shift_taps(x_lo)
    lo = l1 + l2 + l3 + l4 - 4.0 * x_lo + k * x_lo
    r = (s + (c + lo)) * umf
    rnorm = jnp.sqrt(jnp.sum((r * r).astype(jnp.float64)))
    # b for the norm: S(known), exact cascade of 4 terms
    b1, b2, b3, b4 = shift_taps(known)
    bs, bc = two_sum(b1, b2)
    bs, e = two_sum(bs, b3)
    bc += e
    bs, e = two_sum(bs, b4)
    bc += e
    b_hi = (bs + bc) * umf
    bnorm = jnp.sqrt(jnp.sum((b_hi * b_hi).astype(jnp.float64)))
    return r, rnorm, bnorm


def residual_f64(img32, x64, umask, deg):
    from satellite_approximation_tpu.models.cg import shift_sum

    um64 = umask.astype(jnp.float64)
    img64 = img32.astype(jnp.float64)
    b64 = shift_sum(img64 * (1.0 - um64)) * um64
    x = x64 * um64
    ax = (deg.astype(jnp.float64) * x - shift_sum(x)) * um64
    r = (b64 - ax) * um64
    return r, jnp.sqrt(jnp.sum(r * r)), jnp.sqrt(jnp.sum(b64 * b64))


def main():
    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models.cg import neighbor_degree
    from roofline import make_mask

    # --- accuracy at 4096^2: x near the true solution (residual ~1e-6*b) ---
    n = 4096
    m_np = make_mask(n, n)
    deg_np = neighbor_degree((n, n))
    rng = np.random.default_rng(0)
    img_np = (rng.random((1, n, n), dtype=np.float32) * 10000).astype(np.uint16)

    from satellite_approximation_tpu.models.fill import laplace_fill

    res = laplace_fill(
        jnp.asarray(img_np), jnp.asarray(m_np), tolerance=1e-6,
        masked_values_output=False, device_output=True,
    )
    # rebuild a near-converged x64 from the composite (known pixels exact)
    x64 = res.x.astype(jnp.float64) * jnp.asarray(m_np)

    img = jnp.asarray(img_np)
    umask = jnp.asarray(m_np)
    deg = jnp.asarray(deg_np)

    r64, rn64, bn64 = jax.jit(residual_f64)(img, x64, umask, deg)
    x_hi = x64.astype(jnp.float32)
    x_lo = (x64 - x_hi.astype(jnp.float64)).astype(jnp.float32)
    rdf, rndf, bndf = jax.jit(residual_dfloat)(img, x_hi, x_lo, umask, deg)

    rn64v, bn64v, rndfv, bndfv = map(float, (rn64, bn64, rndf, bndf))
    diff = float(jnp.max(jnp.abs(rdf.astype(jnp.float64) - r64)))
    print(f"4096^2: ||r||_64={rn64v:.6e}  ||r||_df={rndfv:.6e}  "
          f"rel gap={abs(rn64v-rndfv)/max(rn64v,1e-300):.2e}")
    print(f"        ||b||_64={bn64v:.6e}  ||b||_df={bndfv:.6e}")
    print(f"        max |r_df - r_64| = {diff:.3e}  (vs ||r||/sqrt(n) ~ "
          f"{rn64v/n:.3e})")

    # --- timing at 10980^2 ---
    n = 10980
    m_np = make_mask(n, n)
    deg_np = neighbor_degree((n, n))
    img_np = (rng.random((1, n, n), dtype=np.float32) * 10000).astype(np.uint16)
    img = jnp.asarray(img_np)
    umask = jnp.asarray(m_np)
    deg = jnp.asarray(deg_np)
    x64 = img.astype(jnp.float64) * umask
    x_hi = x64.astype(jnp.float32)
    x_lo = jnp.zeros_like(x_hi)
    float(x_hi.sum())

    f64_j = jax.jit(residual_f64)
    df_j = jax.jit(residual_dfloat)

    def run64():
        r, rn, bn = f64_j(img, x64, umask, deg)
        return float(rn)

    def rundf():
        r, rn, bn = df_j(img, x_hi, x_lo, umask, deg)
        return float(rn)

    for label, fn in (("f64 residual pass", run64), ("dfloat residual pass", rundf)):
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{label:28s} {ts[len(ts)//2]*1e3:8.1f} ms (min {min(ts)*1e3:.1f})")


if __name__ == "__main__":
    main()
