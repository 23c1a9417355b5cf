"""EXPERIMENT: prolong formulations, round 2 — beat jnp.repeat's lane
relayout WITHOUT the reduce_window path that miscompiles on this
toolchain (see multigrid._prolong docstring / TestTransferLowering).

Candidates (all must be VALUE-identical to repeat — verified on-chip at
sizes >= 1024^2 where the reduce_window bug appears — sums only ever add
exact zeros):

  a. jnp.repeat x2 (current production)
  b. interior-pad dilation + static roll-add per axis:
     d[2i] = e[i]; out = d + roll(d, 1, axis) -> out[2i]=e[i], out[2i+1]=e[i]
  c. same but both axes padded first, then two roll-adds
  d. stack+reshape on the row axis, roll-add on the lane axis

Metric is the FUSED consumer (r + prolong(e) * m), like the V-cycle.

Run: python benchmarks/x_prolong2.py [--size 10980]
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


def pr_repeat(e):
    return jnp.repeat(jnp.repeat(e, 2, axis=-2), 2, axis=-1)


def _dilate(e, axis):
    """d[..., 2i, ...] = e[..., i, ...], zeros between + one trailing."""
    cfg = [(0, 0, 0)] * e.ndim
    cfg[axis] = (0, 1, 1)
    return lax.pad(e, jnp.zeros((), e.dtype), cfg)


def pr_rollrows_then_cols(e):
    d = _dilate(e, e.ndim - 2)
    rows = d + jnp.roll(d, 1, axis=-2)
    d2 = _dilate(rows, e.ndim - 1)
    return d2 + jnp.roll(d2, 1, axis=-1)


def pr_dilate_both_rolls(e):
    d = _dilate(_dilate(e, e.ndim - 2), e.ndim - 1)
    s = d + jnp.roll(d, 1, axis=-1)
    return s + jnp.roll(s, 1, axis=-2)


def pr_stack_rows_roll_cols(e):
    st = jnp.stack([e, e], axis=-2)  # (..., h2, 2, w2)
    rows = st.reshape(*e.shape[:-2], 2 * e.shape[-2], e.shape[-1])
    d = _dilate(rows, e.ndim - 1)
    return d + jnp.roll(d, 1, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()
    import satellite_approximation_tpu  # noqa: F401

    cands = [
        ("repeat (current)", pr_repeat),
        ("dilate+roll rows->cols", pr_rollrows_then_cols),
        ("dilate both + 2 rolls", pr_dilate_both_rolls),
        ("stack rows + roll cols", pr_stack_rows_roll_cols),
    ]

    # correctness first, at sizes where the reduce_window bug bites
    rng = np.random.default_rng(4)
    for h2 in (513, 1024):
        e = jnp.asarray(rng.random((1, h2, h2), dtype=np.float32))
        want = np.asarray(jax.jit(pr_repeat)(e))
        for name, f in cands[1:]:
            got = np.asarray(jax.jit(f)(e))
            d = np.abs(got - want).max()
            status = "OK" if d == 0.0 else f"WRONG max|d|={d}"
            print(f"correctness {name:28s} @coarse {h2}: {status}", flush=True)

    h = w = args.size
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    e0 = jnp.asarray(rng.random((1, h2, w2), dtype=np.float32))
    r0 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    um = jnp.asarray(rng.random((h, w)) < 0.2)
    float(e0.sum()); float(r0.sum()); float(um.sum())

    for name, f in cands:
        @jax.jit
        def chain(k, e, r, m, f=f):
            def body(_, acc):
                p = f(e * (1.0 + acc * 1e-30))[..., :h, :w]
                return acc + (r + p * m.astype(jnp.float32)).sum()

            return lax.fori_loop(0, k, body, jnp.float32(0.0))

        sec = marginal(functools.partial(lambda k, e: chain(k, e, r0, um), e=e0))
        print(f"fused prolong+mask+add {name:28s} {sec*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
