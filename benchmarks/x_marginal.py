"""EXPERIMENT: RTT-free marginal timings of the solver components.

On this tunneled runtime every dispatch pays a ~25 ms round trip, so
absolute single-call timings are useless (see roofline_2048_r03_pre.json:
a 67 MB A-apply "takes" 27.8 ms). This harness times k chained
applications inside ONE jitted program (data dependency forces serial
execution) for two values of k and reports (t[k2] - t[k1]) / (k2 - k1).

Run: python benchmarks/x_marginal.py [--size 2048]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def marginal(build_chained, k1=4, k2=36, runs=5):
    """build_chained(k) -> blocking zero-arg callable running k chained
    applications. Returns seconds per application."""
    f1 = build_chained(k1)
    f2 = build_chained(k2)
    f1()
    f2()
    t1s, t2s = [], []
    for _ in range(runs):
        t0 = time.perf_counter()
        f1()
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        f2()
        t2s.append(time.perf_counter() - t0)
    t1s.sort()
    t2s.sort()
    return (t2s[len(t2s) // 2] - t1s[len(t1s) // 2]) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--channels", type=int, default=1)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import masked_laplacian, neighbor_degree
    from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
    from satellite_approximation_tpu.utils import roofline as rl
    from roofline import make_mask

    h = w = args.size
    c = args.channels
    m_np = make_mask(h, w)
    deg = neighbor_degree((h, w))
    hier = multigrid._device_hierarchy(m_np, deg)
    levels_j = hier.levels
    um_j, deg_j = levels_j[0]
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    b0 = jnp.asarray(rng.random((c, h, w), dtype=np.float32))
    jax.block_until_ready((u0, b0))
    peak = rl.hbm_peak_gbps()

    def report(name, sec, nbytes):
        gbps = nbytes / sec / 1e9
        print(
            f"{name:42s} {sec*1e6:9.1f} us  {gbps:7.1f} GB/s "
            f"({100*gbps/peak:5.1f}% SoL)",
            flush=True,
        )

    # --- fused Pallas smoother, varying sweeps ---
    for sweeps in (2, 6):
        def build(k, sweeps=sweeps):
            @jax.jit
            def chained(u):
                def body(_, u):
                    return fused_jacobi_tpu(u, b0, um_j, deg_j, sweeps=sweeps)
                return lax.fori_loop(0, k, body, u)
            return lambda: jax.block_until_ready(chained(u0))

        sec = marginal(build)
        report(
            f"pallas smoother {sweeps} sweeps",
            sec,
            rl.smoother_bytes(h, w, c),
        )

    # --- smoother + residual ---
    def build_sr(k):
        @jax.jit
        def chained(u):
            def body(_, u):
                u2, r = fused_jacobi_tpu(
                    u, b0, um_j, deg_j, sweeps=6, emit_residual=True
                )
                return u2 + 1e-30 * r  # keep both outputs live
            return lax.fori_loop(0, k, body, u)
        return lambda: jax.block_until_ready(chained(u0))

    report(
        "pallas smoother+residual 6 sweeps",
        marginal(build_sr),
        rl.smoother_bytes(h, w, c, emit_residual=True),
    )

    # --- XLA A-apply ---
    def build_ml(k):
        @jax.jit
        def chained(u):
            def body(_, u):
                return masked_laplacian(u, um_j, deg_j)
            return lax.fori_loop(0, k, body, u)
        return lambda: jax.block_until_ready(chained(u0))

    report("masked_laplacian (XLA)", marginal(build_ml), rl.laplacian_bytes(h, w, c, 4))

    # --- one full V-cycle ---
    pdtype = multigrid._precond_dtype_for((h, w))
    dbytes = 2 if pdtype == jnp.bfloat16 else 4
    levels_p = tuple((lm, ld.astype(pdtype)) for lm, ld in levels_j)
    shapes = [tuple(lm.shape) for lm, _ in levels_j]

    def build_vc(k):
        @jax.jit
        def chained(u):
            def body(_, u):
                return multigrid._v_cycle(
                    levels_p, u.astype(pdtype), jnp.zeros(u.shape, pdtype), 0,
                    hier.coarse_inv,
                ).astype(u.dtype)
            return lax.fori_loop(0, k, body, u)
        return lambda: jax.block_until_ready(chained(u0))

    vc_sec = marginal(build_vc)
    report("full V-cycle", vc_sec, rl.vcycle_bytes(shapes, c, dbytes))

    # --- V-cycle with the coarse solve stubbed out (isolate its cost) ---
    def build_vc_trunc(k):
        lv = levels_p[:-1]

        @jax.jit
        def chained(u):
            def body(_, u):
                # coarsest level becomes a single smoother application
                return multigrid._v_cycle(
                    lv, u.astype(pdtype), jnp.zeros(u.shape, pdtype), 0
                ).astype(u.dtype)
            return lax.fori_loop(0, k, body, u)
        return lambda: jax.block_until_ready(chained(u0))

    # NOTE: truncated hierarchy's last level runs the coarse CG at the
    # second-coarsest size instead — still informative as an A/B of where
    # time goes when the tail changes shape.
    vct_sec = marginal(build_vc_trunc)
    report("V-cycle w/ one fewer level", vct_sec, rl.vcycle_bytes(shapes[:-1], c, dbytes))

    # --- pure tiny-grid PCG iteration cost (tiny-op overhead regime) ---
    m_small = np.zeros((64, 64), bool)
    m_small[16:48, 16:48] = True
    lv_small = multigrid._device_hierarchy(m_small, neighbor_degree((64, 64)))
    r_small = jnp.asarray(rng.random((1, 64, 64), dtype=np.float32))
    z_small = jnp.zeros_like(r_small)

    def build_small(k):
        def run():
            out = multigrid._pcg_run(
                r_small, z_small, jnp.asarray(1e-30, jnp.float32), lv_small,
                max_iterations=k, precond_dtype=jnp.float32,
            )
            return jax.block_until_ready(out)
        return run

    report("PCG iteration @ 64x64 (tiny-op regime)", marginal(build_small), 1)

    # --- marginal PCG iteration at full size ---
    z0 = jnp.zeros_like(u0)

    def build_pcg(k):
        def run():
            out = multigrid._pcg_run(
                u0, z0, jnp.asarray(1e-30, jnp.float32), hier,
                max_iterations=k, precond_dtype=pdtype,
            )
            return jax.block_until_ready(out)
        return run

    report(
        "marginal PCG iteration",
        marginal(build_pcg),
        rl.pcg_iteration_bytes(shapes, c, 4, dbytes),
    )


if __name__ == "__main__":
    main()
