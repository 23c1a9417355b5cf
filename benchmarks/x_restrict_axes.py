"""EXPERIMENT: which half of the block restrict costs, row (sublane) or
column (lane) pair-sums, at full tile — and does a lane-only
reduce_window beat the strided-slice compaction?

Run: python benchmarks/x_restrict_axes.py [--size 10980]
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
    rng = np.random.default_rng(0)
    full = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    half = jnp.asarray(rng.random((1, h // 2, w), dtype=np.float32))
    float(full.sum()); float(half.sum())

    def rows_slices(x):
        return x[..., 0::2, :] + x[..., 1::2, :]

    def cols_slices(x):
        return x[..., :, 0::2] + x[..., :, 1::2]

    def cols_rw(x):
        return lax.reduce_window(
            x, 0.0, lax.add, (1, 1, 2), (1, 1, 2), "VALID"
        )

    def rows_rw(x):
        return lax.reduce_window(
            x, 0.0, lax.add, (1, 2, 1), (1, 2, 1), "VALID"
        )

    cases = [
        ("rows slices on (h,w)", rows_slices, full),
        ("cols slices on (h,w)", cols_slices, full),
        ("cols slices on (h/2,w)", cols_slices, half),
        ("cols reduce_window (h/2,w)", cols_rw, half),
        ("rows reduce_window (h,w)", rows_rw, full),
        ("full restrict rows->cols", lambda x: cols_slices(rows_slices(x)), full),
        ("full restrict rows_rw->cols", lambda x: cols_slices(rows_rw(x)), full),
    ]
    for name, f, arg in cases:
        @jax.jit
        def chain(k, a, f=f):
            def body(_, acc):
                return acc + f(a * (1.0 + acc * 1e-30)).sum()

            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        sec = marginal(functools.partial(lambda k, a: chain(k, a), a=arg))
        print(f"{name:32s} {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
