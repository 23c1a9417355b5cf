"""Stage-level profile of the 10980^2 single-band fill: where do the
16-20 s go? (round-2 perf investigation, VERDICT item 2)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def t(label, f):
    t0 = time.perf_counter()
    out = f()
    dt = time.perf_counter() - t0
    print(f"{label:45s} {dt:8.3f}s", flush=True)
    return out


def main():
    import satellite_approximation_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import _residual64_device

    H = W = 10980
    rng = np.random.default_rng(0)
    yy, xx = np.ogrid[:H, :W]
    m = np.zeros((H, W), bool)
    for _ in range(60):
        cy, cx = rng.integers(200, H - 200), rng.integers(200, W - 200)
        ry, rx = rng.integers(30, 300), rng.integers(30, 300)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
    print(f"masked fraction: {m.mean():.3f}")

    img = rng.random((1, H, W), dtype=np.float32).astype(np.float64)
    known = img * (~m)
    p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
    b = (
        p[:, 0:H, 1 : W + 1] + p[:, 2 : H + 2, 1 : W + 1]
        + p[:, 1 : H + 1, 0:W] + p[:, 1 : H + 1, 2 : W + 2]
    ) * m
    x0 = img * m

    # --- raw transfer costs ---
    def sync(x):
        return float(jnp.sum(x[..., ::997, ::997]))

    img32_j = t("H2D img as f32 (482MB)", lambda: jax.block_until_ready(
        jnp.asarray(img.astype(np.float32))))
    t("  (sync)", lambda: sync(img32_j))
    um_j = t("H2D mask bool (120MB)", lambda: jax.block_until_ready(jnp.asarray(m)))
    t("  (sync)", lambda: float(jnp.sum(um_j[::997, ::997])))

    # device-side assembly: b64/x064 from the f32 image + mask
    @jax.jit
    def assemble(img32, um):
        um64 = um.astype(jnp.float64)
        known = img32.astype(jnp.float64) * (1.0 - um64)
        from satellite_approximation_tpu.models.cg import shift_sum
        b64 = shift_sum(known) * um64
        x064 = img32.astype(jnp.float64) * um64
        return b64, x064

    b64_j, x064_j = t("assemble b64/x0 on device COMPILE+run", lambda: jax.block_until_ready(
        assemble(img32_j, um_j)))
    t("assemble steady", lambda: jax.block_until_ready(assemble(img32_j, um_j)))
    np.testing.assert_allclose(np.asarray(b64_j[..., ::97, ::97]), b[..., ::97, ::97])

    # --- hierarchy ---
    from satellite_approximation_tpu.models.cg import neighbor_degree
    deg = neighbor_degree((H, W))
    levels_j = t("build+upload hierarchy", lambda: multigrid._device_hierarchy(m, deg))

    # --- solver executables ---
    deg_j = jnp.asarray(deg)
    r64_j, rnorm_j = t(
        "residual64 COMPILE+run",
        lambda: jax.block_until_ready(_residual64_device(b64_j, x064_j, um_j, deg_j)),
    )[0:2]
    t("residual64 steady", lambda: jax.block_until_ready(
        _residual64_device(b64_j, x064_j, um_j, deg_j)))
    t("rnorm scalar fetch (RTT)", lambda: np.asarray(rnorm_j))

    r32 = r64_j.astype(jnp.float32)
    z32 = jnp.zeros(r32.shape, jnp.float32)

    def pcg(n):
        return multigrid._pcg_run(
            r32, z32, jnp.asarray(1e-30, jnp.float32), levels_j, max_iterations=n
        )

    out = t("pcg COMPILE + 1 iter", lambda: jax.block_until_ready(pcg(1)))
    t("pcg 1 iter steady", lambda: jax.block_until_ready(pcg(1)))
    t("pcg 2 iters", lambda: jax.block_until_ready(pcg(2)))
    t("pcg 4 iters", lambda: jax.block_until_ready(pcg(4)))
    t("pcg 8 iters", lambda: jax.block_until_ready(pcg(8)))

    # V-cycle alone (compile separately? it's embedded; time via 0 iters)
    t("pcg 0 iters (setup: 1 precond+resid)", lambda: jax.block_until_ready(pcg(0)))

    # fine-level pieces, jitted standalone
    from satellite_approximation_tpu.models.cg import masked_laplacian
    ml = jax.jit(lambda u: masked_laplacian(u, um_j, deg_j))
    t("masked_laplacian f32 COMPILE+run", lambda: jax.block_until_ready(ml(r32)))
    t("masked_laplacian f32 steady", lambda: jax.block_until_ready(ml(r32)))

    from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
    um0, deg0 = levels_j[0]
    b16 = r32.astype(jnp.bfloat16)
    t("fused_jacobi bf16 6 sweeps COMPILE+run", lambda: jax.block_until_ready(
        fused_jacobi_tpu(b16, b16, um0.astype(jnp.bfloat16), deg0.astype(jnp.bfloat16), sweeps=6)))
    t("fused_jacobi bf16 6 sweeps steady", lambda: jax.block_until_ready(
        fused_jacobi_tpu(b16, b16, um0.astype(jnp.bfloat16), deg0.astype(jnp.bfloat16), sweeps=6)))

    # full solve end-to-end with device-resident inputs
    res = t("FULL solve, device-resident inputs", lambda: multigrid.solve(
        b64_j, um_j, deg=deg, x0=x064_j, tolerance=1e-6, refinement_steps=3,
        device_output=True))
    print(f"  iters={res.iterations} rel={res.error:.2e}")
    res = t("FULL solve again (warm)", lambda: multigrid.solve(
        b64_j, um_j, deg=deg, x0=x064_j, tolerance=1e-6, refinement_steps=3,
        device_output=True))
    print(f"  iters={res.iterations} rel={res.error:.2e}")


if __name__ == "__main__":
    main()
