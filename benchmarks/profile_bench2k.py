"""Component-level timing of the bench.py workload (13-band 2048^2):
how far is each PCG building block from HBM-bandwidth speed-of-light?

Per-iteration cost model (f32, 13 bands, 2048^2):
  A-apply: ~5 reads + 1 write of 218 MB  -> ~1.6 GB  (~2 ms at 800 GB/s)
  V-cycle: (6+6 sweeps + transfers) x levels, bf16    (~8 ms)
  dots/axpys: ~6 passes                               (~1.6 ms)
So ~12 ms/iter is the rough speed-of-light; measure what we actually get.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(label, fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:50s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    import satellite_approximation_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    import bench
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import masked_laplacian

    m = bench.make_mask(bench.H, bench.W)
    img = np.stack([bench.smooth(bench.H, bench.W, s) for s in range(bench.BANDS)])
    x = jnp.asarray(img * m, jnp.float32)
    um_j = jnp.asarray(m)
    deg_j = jax.jit(multigrid._neighbor_degree_traced, static_argnums=(0, 1))(
        bench.H, bench.W
    )
    hier = multigrid._device_hierarchy(um_j, deg_j)
    levels = hier.levels
    pdtype = multigrid._precond_dtype_for((bench.H, bench.W))
    print(f"precond dtype: {pdtype.__name__}; levels: {[l[0].shape for l in levels]}")

    apply_j = jax.jit(lambda u: masked_laplacian(u, um_j, deg_j))
    timeit("A-apply (13 x 2048^2 f32)", lambda: float(apply_j(x)[::499, ::499, ::499].sum()))

    lv16 = tuple((m_, d_.astype(pdtype)) for m_, d_ in levels)
    x16 = x.astype(pdtype)

    @jax.jit
    def one_smooth(u):
        um, deg = lv16[0]
        return multigrid._smooth(u, u, um, deg, multigrid._PRE_SMOOTH)

    timeit(f"{multigrid._PRE_SMOOTH} smoother sweeps, finest level",
           lambda: float(one_smooth(x16)[::499, ::499, ::499].astype(jnp.float32).sum()))

    @jax.jit
    def vcycle(r):
        return multigrid._v_cycle(lv16, r, jnp.zeros_like(r), 0, hier.coarse_inv)

    timeit("one full V-cycle", lambda: float(vcycle(x16)[::499, ::499, ::499].astype(jnp.float32).sum()))

    @jax.jit
    def pcg_iters(b, n):
        out = multigrid._pcg_core(
            b, jnp.zeros_like(b), jnp.float32(1e-30), hier,
            max_iterations=n, precond_dtype=pdtype,
        )
        return out[0], out[1]

    for n in (1, 5, 10):
        d = timeit(f"PCG {n} iterations (tol=0)",
                   lambda n=n: float(pcg_iters(x, n)[0][::499, ::499, ::499].sum()))
    print(f"-> marginal per-iteration: {(timeit('PCG 20 iterations', lambda: float(pcg_iters(x, 20)[0][::499, ::499, ::499].sum())) - d) / 10 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
