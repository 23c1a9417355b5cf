"""EXPERIMENT: full-tile marginal costs with arg-passed operands.

x_marginal.py bakes the hierarchy into the jitted chain as closure
constants, which embeds the full-tile rasters into the remote-compile
payload (HTTP 413 at 10980^2) — this variant passes every operand as a
jit argument and fences with a scalar fetch (block_until_ready does not
reliably fence on this runtime; see bench.py).

Run: python benchmarks/x_marginal2.py [--size 10980]
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
    f1 = functools.partial(fn, k1)
    f2 = functools.partial(fn, k2)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10980)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import neighbor_degree
    from satellite_approximation_tpu.utils import roofline as rl
    from roofline import make_mask

    h = w = args.size
    m_np = make_mask(h, w)
    deg = neighbor_degree((h, w))
    hier = multigrid._device_hierarchy(m_np, deg)
    levels_j = hier.levels
    shapes = [tuple(lm.shape) for lm, _ in levels_j]
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    float(u0.sum())
    peak = rl.hbm_peak_gbps()

    def report(name, sec, nbytes):
        gbps = nbytes / sec / 1e9
        print(
            f"{name:34s} {sec*1e3:9.2f} ms  {gbps:7.1f} GB/s "
            f"({100*gbps/peak:5.1f}% SoL)",
            flush=True,
        )

    pdtype = multigrid._precond_dtype_for((h, w))
    dbytes = 2 if pdtype == jnp.bfloat16 else 4
    levels_p = tuple((lm, ld.astype(pdtype)) for lm, ld in levels_j)

    @jax.jit
    def chain_vc(k, u, levels, cinv):
        def body(_, u):
            return multigrid._v_cycle(
                levels, u.astype(pdtype), jnp.zeros(u.shape, pdtype), 0, cinv
            ).astype(u.dtype)

        return lax.fori_loop(0, k, body, u).sum()

    sec = marginal(lambda k: chain_vc(jnp.int32(k), u0, levels_p, hier.coarse_inv))
    report("full V-cycle", sec, rl.vcycle_bytes(shapes, 1, dbytes))

    # PCG iteration marginal: run max_iterations k with impossible tol
    z0 = jnp.zeros_like(u0)

    def pcg_k(k):
        out = multigrid._pcg_run(
            u0, z0, jnp.asarray(1e-30, jnp.float32), hier,
            max_iterations=int(k), precond_dtype=pdtype,
        )
        x = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(x)  # device scalar; float() in marginal() fences

    sec = marginal(pcg_k, k1=4, k2=24)
    report("marginal PCG iteration", sec, rl.pcg_iteration_bytes(shapes, 1, 4, dbytes))


if __name__ == "__main__":
    main()
