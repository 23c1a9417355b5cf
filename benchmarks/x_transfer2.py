"""EXPERIMENT 2: which axis of restrict/prolong is slow, and what lowering
fixes it?

Conv (x_transfer_ops) lost 14x: a C=1 4x4 conv wastes the MXU. This probes
the slice formulation axis-by-axis at (2, N, N):

  1. row restrict only     — stride-2 slices on the SUBLANE axis, no moveaxis
  2. col restrict only     — stride-2 slices on the LANE axis, no moveaxis
  3. col restrict, pair-reshape — reshape (.., W) -> (.., W/2, 2), stride-1
     shifts on the W/2 axis, single squeeze back
  4. full restrict, transpose-sandwich — row-restrict, transpose, row-restrict,
     transpose back (all strided work on sublanes)
  5. current full restrict (moveaxis + lane strides)
  and the prolong analogs.

Run: python benchmarks/x_transfer2.py [--size 10980] [--channels 2]
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

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(1)

    def row_restrict(r):
        # rows: out[i] = .25 r[2i-1] + .75 r[2i] + .75 r[2i+1] + .25 r[2i+2]
        h = r.shape[-2]
        ph = (h + 1) // 2 * 2
        pad = [(0, 0)] * (r.ndim - 2) + [(1, 2 + ph - h), (0, 0)]
        rp = jnp.pad(r, pad)
        c = ph // 2
        return (
            0.25 * rp[..., 0 : 2 * c : 2, :]
            + 0.75 * rp[..., 1 : 2 * c + 1 : 2, :]
            + 0.75 * rp[..., 2 : 2 * c + 2 : 2, :]
            + 0.25 * rp[..., 3 : 2 * c + 3 : 2, :]
        )

    def col_restrict(r):
        w = r.shape[-1]
        pw = (w + 1) // 2 * 2
        pad = [(0, 0)] * (r.ndim - 1) + [(1, 2 + pw - w)]
        rp = jnp.pad(r, pad)
        c = pw // 2
        return (
            0.25 * rp[..., 0 : 2 * c : 2]
            + 0.75 * rp[..., 1 : 2 * c + 1 : 2]
            + 0.75 * rp[..., 2 : 2 * c + 2 : 2]
            + 0.25 * rp[..., 3 : 2 * c + 3 : 2]
        )

    def col_restrict_pairs(r):
        # stride-1 formulation: split lanes into (W/2, 2) pairs; x[2i]=p[i,0],
        # x[2i+1]=p[i,1]; out[i] = .25 p[i-1,1] + .75 p[i,0] + .75 p[i,1]
        #                          + .25 p[i+1,0]
        w = r.shape[-1]
        pw = (w + 1) // 2 * 2
        pad = [(0, 0)] * (r.ndim - 1) + [(0, pw - w)]
        rp = jnp.pad(r, pad)
        p = rp.reshape(rp.shape[:-1] + (pw // 2, 2))
        e, o = p[..., 0], p[..., 1]
        o_prev = jnp.pad(o, [(0, 0)] * (o.ndim - 1) + [(1, 0)])[..., :-1]
        e_next = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(0, 1)])[..., 1:]
        return 0.25 * o_prev + 0.75 * e + 0.75 * o + 0.25 * e_next

    def tsandwich_restrict(r):
        a = row_restrict(r)
        a = jnp.swapaxes(a, -1, -2)
        a = row_restrict(a)
        return jnp.swapaxes(a, -1, -2)

    def pairs_restrict(r):
        return col_restrict_pairs(row_restrict(r))

    # correctness at an odd size
    small = jnp.asarray(rng.random((3, 517, 411), dtype=np.float32))
    ref = multigrid._restrict(small)
    for name, fn in (
        ("tsandwich", tsandwich_restrict),
        ("pairs", pairs_restrict),
    ):
        got = fn(small)
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        d = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name} restrict max|diff| = {d:.3e}", flush=True)
        assert d < 1e-5, name

    # prolong variants
    def row_prolong(e):
        left = jnp.pad(e, [(0, 0)] * (e.ndim - 2) + [(1, 0), (0, 0)])[..., :-1, :]
        right = jnp.pad(e, [(0, 0)] * (e.ndim - 2) + [(0, 1), (0, 0)])[..., 1:, :]
        even = 0.75 * e + 0.25 * left
        odd = 0.75 * e + 0.25 * right
        out = jnp.stack([even, odd], axis=-2)  # (..., Hc, 2, W)
        return out.reshape(*e.shape[:-2], 2 * e.shape[-2], e.shape[-1])

    def col_prolong_pairs(e):
        left = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(1, 0)])[..., :-1]
        right = jnp.pad(e, [(0, 0)] * (e.ndim - 1) + [(0, 1)])[..., 1:]
        even = 0.75 * e + 0.25 * left
        odd = 0.75 * e + 0.25 * right
        out = jnp.stack([even, odd], axis=-1)  # (..., Wc, 2)
        return out.reshape(*e.shape[:-1], 2 * e.shape[-1])

    def tsandwich_prolong(e, fine_shape):
        a = row_prolong(e)
        a = jnp.swapaxes(a, -1, -2)
        a = row_prolong(a)
        a = jnp.swapaxes(a, -1, -2)
        return a[..., : fine_shape[-2], : fine_shape[-1]]

    def pairs_prolong(e, fine_shape):
        a = col_prolong_pairs(row_prolong(e))
        return a[..., : fine_shape[-2], : fine_shape[-1]]

    coarse = jnp.asarray(rng.random((3, 259, 206), dtype=np.float32))
    refp = multigrid._prolong(coarse, (3, 517, 411))
    for name, fn in (("tsandwich", tsandwich_prolong), ("pairs", pairs_prolong)):
        got = fn(coarse, (3, 517, 411))
        assert got.shape == refp.shape, (name, got.shape)
        d = float(jnp.max(jnp.abs(got - refp)))
        print(f"{name} prolong  max|diff| = {d:.3e}", flush=True)
        assert d < 1e-5, name

    for n in (2048, args.size):
        c = args.channels
        u0 = jnp.asarray(rng.random((c, n, n), dtype=np.float32))
        jax.block_until_ready(u0)

        def sync(x):
            return float(jnp.sum(x[..., ::997, ::997]))

        def probe(name, fn):
            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(r, k):
                return lax.fori_loop(0, k, lambda _, r: r + 1e-30 * fn(r), r)

            sec = marginal(lambda k: (lambda: sync(chain(u0, k=k))))
            print(f"{n:6d}^2 x{c}  {name:28s} {sec*1e3:9.2f} ms", flush=True)

        probe("row restrict only", lambda r: row_prolong(row_restrict(r))[..., :n, :])
        probe("col restrict only (lane)", lambda r: col_prolong_pairs(col_restrict(r))[..., :n])
        probe("col restrict only (pairs)", lambda r: col_prolong_pairs(col_restrict_pairs(r))[..., :n])
        probe(
            "full r+p tsandwich",
            lambda r: tsandwich_prolong(tsandwich_restrict(r), r.shape),
        )
        probe("full r+p pairs", lambda r: pairs_prolong(pairs_restrict(r), r.shape))
        probe(
            "full r+p current",
            lambda r: multigrid._prolong(multigrid._restrict(r), r.shape),
        )


if __name__ == "__main__":
    main()
