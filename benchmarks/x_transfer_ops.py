"""EXPERIMENT: restrict/prolong lowering — strided slices vs conv.

x_vcycle_profile measured the level-0 restrict+prolong round trip at 47 ms
for (2, 10980, 10980) — 15x its ~3 ms HBM traffic bound and the single
largest term in the V-cycle. Hypothesis: stride-2 slicing along the lane
(minor) axis and the moveaxis transposes lower to lane shuffles / relayouts
at tile scale. Candidate: express

  restrict = 2D correlation, kernel outer([.25,.75,.75,.25]^2), stride 2,
             padding (1,2) per axis            (exactly the current math)
  prolong  = input-dilated (lhs_dilation=2) correlation with the same
             kernel, padding (2,2) per axis    (exact transpose, as now)

Checks allclose against the current implementation, then chained-
differencing marginals for both at 2048^2 and the requested size.

Run: python benchmarks/x_transfer_ops.py [--size 10980] [--channels 2]
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


_K1D = np.array([0.25, 0.75, 0.75, 0.25], np.float32)


def conv_restrict(r):
    import jax.numpy as jnp
    from jax import lax

    h, w = r.shape[-2], r.shape[-1]
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    lead = r.shape[:-2]
    x = r.reshape((-1, 1) + r.shape[-2:])
    k = jnp.asarray(np.outer(_K1D, _K1D), r.dtype).reshape(1, 1, 4, 4)
    out = lax.conv_general_dilated(
        x, k, window_strides=(2, 2),
        padding=((1, 2 + ph - h), (1, 2 + pw - w)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,  # default lowers f32 conv to bf16 MXU passes (measured 5e-3 error)
    )
    return out.reshape(lead + out.shape[-2:])


def conv_prolong(e, fine_shape):
    import jax.numpy as jnp
    from jax import lax

    lead = e.shape[:-2]
    x = e.reshape((-1, 1) + e.shape[-2:])
    k = jnp.asarray(np.outer(_K1D, _K1D), e.dtype).reshape(1, 1, 4, 4)
    out = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    out = out[..., : fine_shape[-2], : fine_shape[-1]]
    return out.reshape(lead + out.shape[-2:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    ap.add_argument("--channels", type=int, default=2)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid

    import jax
    import jax.numpy as jnp
    from jax import lax

    # correctness first, at an odd size to exercise the pad/crop path
    rng = np.random.default_rng(1)
    small = jnp.asarray(rng.random((3, 517, 411), dtype=np.float32))
    ref_r = multigrid._restrict(small)
    new_r = conv_restrict(small)
    assert ref_r.shape == new_r.shape, (ref_r.shape, new_r.shape)
    dr = float(jnp.max(jnp.abs(ref_r - new_r)))
    coarse = jnp.asarray(rng.random((3, 259, 206), dtype=np.float32))
    ref_p = multigrid._prolong(coarse, (3, 517, 411))
    new_p = conv_prolong(coarse, (3, 517, 411))
    assert ref_p.shape == new_p.shape
    dp = float(jnp.max(jnp.abs(ref_p - new_p)))
    print(f"restrict max|diff| = {dr:.3e}   prolong max|diff| = {dp:.3e}", flush=True)
    assert dr < 1e-5 and dp < 1e-5

    for n in (2048, args.size):
        h = w = n
        c = args.channels
        u0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
        jax.block_until_ready(u0)

        def sync(x):
            return float(jnp.sum(x[..., ::997, ::997]))

        @functools.partial(jax.jit, static_argnames=("k", "which"))
        def chain(r, k, which):
            def body(_, r):
                if which == "slice":
                    rc = multigrid._restrict(r)
                    return r + 1e-30 * multigrid._prolong(rc, r.shape)
                rc = conv_restrict(r)
                return r + 1e-30 * conv_prolong(rc, r.shape)
            return lax.fori_loop(0, k, body, r)

        for which in ("slice", "conv"):
            sec = marginal(lambda k: (lambda: sync(chain(u0, k=k, which=which))))
            print(f"{n:6d}^2 x{c}  {which:5s} restrict+prolong  {sec*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
