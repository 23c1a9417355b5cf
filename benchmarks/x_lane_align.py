"""EXPERIMENT: does lane misalignment explain the full-tile SoL collapse?

10980 is not a multiple of the 128-lane tile (10980 = 85*128 + 100), so
every lane-dimension shift of a full-tile array relayouts; 11008 = 86*128
is the aligned size one tile up. Config-7 telemetry shows every kernel
dropping from 34-70% SoL at 2048^2 to ~19-29% at 10980^2 — this probe
times the two hot kernels at both sizes with identical sparsity to
separate "bigger" from "misaligned".

All device inputs are passed as jit ARGS (closure constants embed the
full rasters into the remote-compile payload, which 413s at this size).

Run: python benchmarks/x_lane_align.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def marginal(fn, args, k1=4, k2=44, runs=7):
    # this runtime defers execution past block_until_ready — fetching a
    # scalar is the only reliable completion fence (see bench.py)
    f1 = functools.partial(fn, jnp.int32(k1), *args)
    f2 = functools.partial(fn, jnp.int32(k2), *args)
    float(f1())
    float(f2())
    t1s, t2s = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f2())
        t2s.append(time.perf_counter() - t0)
    t1s.sort()
    t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (k2 - k1)


def main():
    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models.cg import (
        masked_laplacian,
        neighbor_degree,
    )
    from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
    from satellite_approximation_tpu.utils import roofline as rl
    from roofline import make_mask

    peak = rl.hbm_peak_gbps()

    @functools.partial(jax.jit, static_argnames=())
    def chain_lap(k, u, um, deg):
        def body(_, u):
            return masked_laplacian(u, um, deg) + u * jnp.float32(1e-30)

        return lax.fori_loop(0, k, body, u).sum()

    @functools.partial(jax.jit, static_argnames=())
    def chain_smooth(k, u, b, um, deg):
        def body(_, u):
            return fused_jacobi_tpu(u, b, um, deg, sweeps=6)

        return lax.fori_loop(0, k, body, u).sum()

    for size in (10980, 11008, 10880):  # misaligned / aligned up / aligned down
        h = w = size
        m_np = make_mask(10980, 10980)  # same sparsity pattern for all
        if size >= 10980:
            m_np = np.pad(m_np, ((0, size - 10980), (0, size - 10980)))
        else:
            m_np = m_np[:size, :size]
        deg = neighbor_degree((h, w))
        um = jnp.asarray(m_np)
        dg = jnp.asarray(deg * m_np)  # deg is host np
        rng = np.random.default_rng(0)
        u0 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
        b0 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
        jax.block_until_ready((um, dg, u0, b0))

        sec = marginal(chain_lap, (u0, um, dg))
        by = rl.laplacian_bytes(h, w, 1, 4)
        print(
            f"masked_laplacian {size}: {sec*1e3:8.2f} ms "
            f"{by/sec/1e9:7.1f} GB/s ({100*by/sec/1e9/peak:5.1f}% SoL)",
            flush=True,
        )
        sec = marginal(chain_smooth, (u0, b0, um, dg))
        by = rl.smoother_bytes(h, w, 1)
        print(
            f"pallas 6-sweep   {size}: {sec*1e3:8.2f} ms "
            f"{by/sec/1e9:7.1f} GB/s ({100*by/sec/1e9/peak:5.1f}% SoL)",
            flush=True,
        )


if __name__ == "__main__":
    main()
