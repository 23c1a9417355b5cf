"""EXPERIMENT: relayout-free grid-transfer formulations at full tile.

x_vcycle_profile measured restrict+prolong at 15.6 ms of a 55.8 ms
full-tile V-cycle (~10% of the HBM traffic bound) — the lane-dimension
stride-2 slices (x[..., 0::2]) and jnp.repeat both relayout. Candidates:

  restrict: (a) current rows-then-cols strided slices
            (b) lax.reduce_window 2x2/2 sum
            (c) reshape-based (h2,2,w2,2) sum over (1,3) then (2)
  prolong+correct: (a) current jnp.repeat x2 * mask + add
                   (b) broadcast_in_dim reshape
                   (c) conv_transpose-free: reduce via (b) fused w/ mask+add

Run: python benchmarks/x_transfer3.py [--size 10980]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def marginal(fn, k1=4, k2=24, runs=5):
    f1 = functools.partial(fn, jnp.int32(k1))
    f2 = functools.partial(fn, jnp.int32(k2))
    float(f1()); float(f2())
    t1s, t2s = [], []
    for _ in range(runs):
        t0 = time.perf_counter(); float(f1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2()); t2s.append(time.perf_counter() - t0)
    t1s.sort(); t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()
    import satellite_approximation_tpu  # noqa: F401

    h = w = args.size
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    e0 = jnp.asarray(rng.random((1, h2, w2), dtype=np.float32))
    um = jnp.asarray(rng.random((h, w)) < 0.2)
    float(r0.sum()); float(e0.sum()); float(um.sum())

    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2

    def restrict_slices(x):
        xp = jnp.pad(x, [(0, 0), (0, ph - h), (0, pw - w)])
        rows = xp[..., 0::2, :] + xp[..., 1::2, :]
        return rows[..., :, 0::2] + rows[..., :, 1::2]

    def restrict_rw(x):
        xp = jnp.pad(x, [(0, 0), (0, ph - h), (0, pw - w)])
        return lax.reduce_window(xp, 0.0, lax.add, (1, 2, 2), (1, 2, 2), "VALID")

    def prolong_repeat(e):
        up = jnp.repeat(jnp.repeat(e, 2, axis=-2), 2, axis=-1)
        return up[..., :h, :w]

    def prolong_dilate_rw(e):
        # d[2i,2j] = e[i,j] (interior-pad dilation), then a stride-1 2x2
        # window sum with low padding 1 replicates each value into its
        # 2x2 block: out[k,l] = d[k - k%2, l - l%2]
        d = lax.pad(
            e,
            jnp.float32(0.0),
            [(0, 0, 0), (0, ph - 2 * h2 + 1, 1), (0, pw - 2 * w2 + 1, 1)],
        )
        out = lax.reduce_window(
            d, 0.0, lax.add, (1, 2, 2), (1, 1, 1), [(0, 0), (1, 0), (1, 0)]
        )
        return out[..., :h, :w]

    cases = [
        ("restrict slices (current)", lambda x, r, m: restrict_slices(x), r0),
        ("restrict reduce_window", lambda x, r, m: restrict_rw(x), r0),
        ("prolong repeat (current)", lambda e, r, m: prolong_repeat(e), e0),
        ("prolong dilate+rw", lambda e, r, m: prolong_dilate_rw(e), e0),
        (
            "prolong+mask+add (current)",
            lambda e, r, m: r + prolong_repeat(e) * m.astype(jnp.float32),
            e0,
        ),
        (
            "prolong+mask+add (dilate+rw)",
            lambda e, r, m: r + prolong_dilate_rw(e) * m.astype(jnp.float32),
            e0,
        ),
    ]
    for name, f, arg in cases:
        # operands ride as jit ARGS — closure constants embed full rasters
        # into the remote-compile payload (HTTP 413 at this size)
        @jax.jit
        def chain(k, arg, r, m, f=f):
            def body(_, acc):
                return acc + f(arg * (1.0 + acc * 1e-30), r, m).sum()

            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        sec = marginal(functools.partial(lambda k, a: chain(k, a, r0, um), a=arg))
        print(f"{name:32s} {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
