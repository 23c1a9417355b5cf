"""Pallas kernel parity tests. These compile Mosaic TPU kernels, so they
run only when a TPU backend is the default (the CPU test run covers the
XLA fallback paths; the driver's TPU bench exercises this kernel for real).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernels need a TPU backend"
)


class TestFusedJacobi:
    @pytest.mark.parametrize("shape", [(2, 300, 500), (1, 112, 128), (3, 1024, 1024)])
    def test_matches_xla_sweeps(self, shape):
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
        from satellite_approximation_tpu.models import multigrid as M
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(0)
        c, h, w = shape
        u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        ref = M._smooth.__wrapped__ if hasattr(M._smooth, "__wrapped__") else None
        # XLA reference: force the non-pallas path by calling the loop inline
        import jax.numpy as jnp2
        from jax import lax

        inv_deg = jnp2.where(dg > 0, 1.0 / dg, 0.0)
        from satellite_approximation_tpu.models.cg import masked_laplacian

        def body(_, uu):
            au = masked_laplacian(uu, um, dg)
            return uu + 0.8 * (b - au) * inv_deg * um.astype(uu.dtype)

        want = lax.fori_loop(0, 8, body, u)
        got = fused_jacobi_tpu(u, b, um, dg, sweeps=8, omega=0.8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)

    def test_emit_residual_matches_xla(self):
        import jax.numpy as jnp
        from jax import lax
        from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
        from satellite_approximation_tpu.models.cg import masked_laplacian, neighbor_degree

        rng = np.random.default_rng(1)
        c, h, w = 2, 600, 700
        u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        inv = jnp.where(dg > 0, 1.0 / dg, 0.0)

        def body(_, uu):
            au = masked_laplacian(uu, um, dg)
            return uu + 0.8 * (b - au) * inv * um.astype(uu.dtype)

        want_u = lax.fori_loop(0, 6, body, u)
        want_r = (b - masked_laplacian(want_u, um, dg)) * um.astype(u.dtype)
        got_u, got_r = fused_jacobi_tpu(
            u, b, um, dg, sweeps=6, omega=0.8, emit_residual=True
        )
        np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u), atol=5e-6)
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r), atol=5e-5)
