"""EXPERIMENT: where does the full-tile (10980^2) solve spend its time?

The 13-band chip-side solve is 26.6 s (results_r03 config 4) for ~250 PCG
iterations whose marginal cost should be ~27 ms each — i.e. iterations
explain only ~7 s. The suspects for the rest are the f64 passes of
_fused_refine_solve: each refinement pass rebuilds b in f64 (5 shifted
adds), applies A in f64, and reduces two norms — all software-emulated
f64 on the v5e VPU.

Measures, via chained differencing (one jitted program, data-dependent
chain, two chain lengths — see x_marginal.py):

  1. marginal PCG iteration at (C,10980,10980)
  2. one f64 residual pass (b rebuild + A-apply + norm)
  3. the same with b cached in HBM f64 (A-apply + norm only)
  4. an exact split-f32 residual pass (b rebuilt in TWO f32 stencil passes
     from the hi/lo split of the f64 image — candidate replacement)

Run: python benchmarks/x_fulltile_refine.py [--size 10980] [--channels 2]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def marginal(build_chained, k1=2, k2=8, runs=5):
    import jax

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
    from satellite_approximation_tpu.models.cg import neighbor_degree, shift_sum

    import functools
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
        # windowed ellipse paint: a full-frame broadcast per blob is ~1 GB of
        # host numpy x 60 on this 1-core host (measured ~20 min)
        y0, y1 = max(cy - ry, 0), min(cy + ry + 1, h)
        x0, x1 = max(cx - rx, 0), min(cx + rx + 1, w)
        yy = np.arange(y0, y1, dtype=np.float32)[:, None]
        xx = np.arange(x0, x1, dtype=np.float32)[None, :]
        m_np[y0:y1, x0:x1] |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m_np[0, :] = m_np[-1, :] = m_np[:, 0] = m_np[:, -1] = False

    deg = neighbor_degree((h, w))
    hier = multigrid._device_hierarchy(m_np, deg)
    um_j, deg_j = hier.levels[0]
    pdtype = multigrid._precond_dtype_for((h, w))

    img32 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    u0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    jax.block_until_ready((img32, u0))

    def sync(x):
        # block_until_ready returns early on this runtime; fetch a strided
        # scalar to force completion
        return float(jnp.sum(x[..., ::997, ::997]))

    def report(name, sec):
        print(f"{name:54s} {sec*1e3:9.2f} ms", flush=True)

    # 1. marginal PCG iteration
    z0 = jnp.zeros_like(u0)

    def build_pcg(k):
        def run():
            out = multigrid._pcg_run(
                u0, z0, jnp.asarray(1e-30, jnp.float32), hier,
                max_iterations=k, precond_dtype=pdtype,
            )
            return sync(out[0])
        return run

    report("marginal PCG iteration", marginal(build_pcg))

    # NOTE: every big array is an explicit jit ARGUMENT — closed-over device
    # arrays embed as HLO constants, and at 10980^2 f64 the serialized
    # program exceeds the remote-compile service's body limit (HTTP 413).

    # 2. f64 residual pass with b rebuilt each time (current design)
    @functools.partial(jax.jit, static_argnames=("k",))
    def resid_rebuild(x64, img, um, deg, k):
        um64 = um.astype(jnp.float64)
        deg64 = deg.astype(jnp.float64)

        def body(_, x):
            inp64 = img.astype(jnp.float64)
            b = shift_sum(inp64 * (1.0 - um64)) * um64
            ax = (deg64 * x - shift_sum(x)) * um64
            r = (b - ax) * um64
            rn = jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))
            return x + 1e-300 * r * rn[..., None, None]
        return lax.fori_loop(0, k, body, x64)

    x64_0 = img32.astype(jnp.float64)
    jax.block_until_ready(x64_0)

    def build_rebuild(k):
        return lambda: sync(resid_rebuild(x64_0, img32, um_j, deg_j, k=k))

    report("f64 residual pass (b rebuilt, current)", marginal(build_rebuild))

    # 3. f64 residual pass with b cached in HBM
    b64_c = shift_sum(img32.astype(jnp.float64) * (1.0 - um_j.astype(jnp.float64))) * um_j.astype(jnp.float64)
    jax.block_until_ready(b64_c)

    @functools.partial(jax.jit, static_argnames=("k",))
    def resid_cached(x64, b, um, deg, k):
        um64 = um.astype(jnp.float64)
        deg64 = deg.astype(jnp.float64)

        def body(_, x):
            ax = (deg64 * x - shift_sum(x)) * um64
            r = (b - ax) * um64
            rn = jnp.sqrt(jnp.sum(r * r, axis=(-2, -1)))
            return x + 1e-300 * r * rn[..., None, None]
        return lax.fori_loop(0, k, body, x64)

    def build_cached(k):
        return lambda: sync(resid_cached(x64_0, b64_c, um_j, deg_j, k=k))

    report("f64 residual pass (b cached in HBM)", marginal(build_cached))

    # 4. pure-f32 A-apply at the same shape, for scale
    @functools.partial(jax.jit, static_argnames=("k",))
    def resid_f32(x32, um, deg, k):
        def body(_, x):
            ax = (deg * x - shift_sum(x)) * um
            rn = jnp.sqrt(jnp.sum(ax * ax, axis=(-2, -1)))
            return x + 1e-30 * ax * rn[..., None, None]
        return lax.fori_loop(0, k, body, x32)

    def build_f32(k):
        return lambda: sync(resid_f32(u0, um_j, deg_j, k=k))

    report("f32 A-apply + norm (same shape, for scale)", marginal(build_f32))


if __name__ == "__main__":
    main()
