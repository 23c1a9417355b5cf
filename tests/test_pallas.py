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


class TestZeroStart:
    """fused_jacobi_zero_tpu must equal fused_jacobi_tpu(zeros, ...)
    BIT-FOR-BIT (A·0 = 0 makes the first sweep omega0*b/deg exactly)."""

    @pytest.mark.parametrize("shape", [(2, 300, 500), (1, 1024, 1100)])
    def test_zero_matches_general_bitwise(self, shape):
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import (
            fused_jacobi_tpu,
            fused_jacobi_zero_tpu,
        )
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(11)
        c, h, w = shape
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        omegas = (0.9, 0.7, 0.8, 1.1, 0.6, 0.75)
        z = jnp.zeros_like(b)
        want_u, want_r = fused_jacobi_tpu(
            z, b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        got_u, got_r = fused_jacobi_zero_tpu(
            b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
        np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
        got_p = fused_jacobi_zero_tpu(b, um, dg, sweeps=6, omega=omegas)
        np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_u))

    def test_zero_padded_matches_plain_bitwise(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import (
            fused_jacobi_zero_tpu,
            fused_jacobi_zero_tpu_padded,
            invm_for_kernel,
            pad_for_kernel,
            slice_from_kernel,
        )
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(12)
        c, h, w = 2, 600, 700
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        omegas = (0.9, 0.7, 0.8, 1.1, 0.6, 0.75)
        want_u, want_r = fused_jacobi_zero_tpu(
            b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        bp = pad_for_kernel(b, h, w)
        imp = pad_for_kernel(invm_for_kernel(um, dg), h, w)
        got_up, got_rp = fused_jacobi_zero_tpu_padded(
            bp, imp, h, w, sweeps=6, omega=omegas, emit_residual=True
        )
        np.testing.assert_array_equal(
            np.asarray(slice_from_kernel(got_up, h, w)), np.asarray(want_u)
        )
        np.testing.assert_array_equal(
            np.asarray(slice_from_kernel(got_rp, h, w)), np.asarray(want_r)
        )


class TestPaddedIO:
    @pytest.mark.parametrize("shape", [(1, 300, 500), (2, 1024, 1100)])
    def test_padded_matches_plain_bitwise(self, shape):
        """The padded-IO variant's interior equals the convenience wrapper
        BIT-FOR-BIT (identical windows, identical arithmetic); rims are
        uninitialized and must be sliced off before non-kernel use."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import (
            fused_jacobi_tpu,
            fused_jacobi_tpu_padded,
            invm_for_kernel,
            pad_for_kernel,
            slice_from_kernel,
        )
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(7)
        c, h, w = shape
        u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        omegas = (0.9, 0.7, 0.8, 1.1, 0.6, 0.75)

        want_u, want_r = fused_jacobi_tpu(
            u, b, um, dg, sweeps=6, omega=omegas, emit_residual=True
        )
        up = pad_for_kernel(u, h, w)
        bp = pad_for_kernel(b, h, w)
        imp = pad_for_kernel(invm_for_kernel(um, dg), h, w)
        got_up, got_rp = fused_jacobi_tpu_padded(
            up, bp, imp, h, w, sweeps=6, omega=omegas, emit_residual=True
        )
        np.testing.assert_array_equal(
            np.asarray(slice_from_kernel(got_up, h, w)), np.asarray(want_u)
        )
        np.testing.assert_array_equal(
            np.asarray(slice_from_kernel(got_rp, h, w)), np.asarray(want_r)
        )

    def test_padded_vcycle_solve_matches_plain(self):
        """End-to-end: a full MG-PCG solve with the padded-resident levels
        converges to the same answer in the same number of iterations as the
        plain path (the padded branch engages above 512^2)."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid as M
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(3)
        h = w = 600  # above the 512^2 pallas floor -> padded branch live
        m_np = rng.random((h, w)) < 0.3
        deg = neighbor_degree((h, w))
        hier = M._device_hierarchy(m_np, deg)
        b = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
        x, it, res = M._pcg_run(
            b, jnp.zeros_like(b), jnp.asarray(1e-8, jnp.float32), hier,
            max_iterations=60, precond_dtype=jnp.float32,
        )
        assert float(jnp.max(res)) < 1e-8 and int(it) < 60


class TestTransferLowering:
    """Guard against a TPU-toolchain miscompile found in round 3: an
    interior-pad dilation + stride-1 2x2 reduce_window prolong is exact in
    eager mode but jit-compiles to wrong values at coarse sizes >= 512^2
    (nearly every element off). These tests pin the PRODUCTION transfer
    formulations (multigrid._restrict / _prolong) against numpy oracles
    at sizes big enough to hit the bad lowering path — they run only on
    the real chip (SAT_TPU_TESTS=1), where the bug lives."""

    @pytest.mark.parametrize("hw", [(2048, 2048), (1373, 1373)])
    def test_restrict_matches_numpy(self, hw):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.multigrid import _restrict

        h, w = hw
        rng = np.random.default_rng(5)
        r = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
        got = np.asarray(jax.jit(_restrict)(r))
        x = np.asarray(r)
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        xp = np.pad(x, [(0, 0), (0, ph - h), (0, pw - w)])
        rows = xp[:, 0::2, :] + xp[:, 1::2, :]
        want = rows[:, :, 0::2] + rows[:, :, 1::2]
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("hw", [(1024, 1024), (687, 687)])
    def test_prolong_matches_numpy(self, hw):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.multigrid import _prolong

        h2, w2 = hw
        fine = (1, 2 * h2 - 1, 2 * w2)  # odd fine height exercises the slice
        rng = np.random.default_rng(6)
        e = jnp.asarray(rng.random((1, h2, w2), dtype=np.float32))
        got = np.asarray(jax.jit(_prolong, static_argnums=1)(e, fine))
        want = np.repeat(np.repeat(np.asarray(e), 2, axis=1), 2, axis=2)[
            :, : fine[-2], : fine[-1]
        ]
        np.testing.assert_array_equal(got, want)


class TestFusedCorr:
    """fused_jacobi_corr_tpu_padded must equal the two-step path
    (u += prolong(e)*mask, then post-smooth) bit-for-bit on every cell the
    V-cycle consumes (interior; known-cell sign-of-zero is out of contract
    — known values never reach interior smoothing)."""

    @pytest.mark.parametrize("shape", [(1, 300, 500), (2, 1024, 1100), (1, 601, 733)])
    def test_matches_two_step_bitwise(self, shape):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.multigrid import _prolong
        from satellite_approximation_tpu.ops.pallas_kernels import (
            corr_half_for_kernel,
            fused_jacobi_corr_tpu_padded,
            fused_jacobi_tpu_padded,
            invm_for_kernel,
            pad_for_kernel,
            slice_from_kernel,
        )
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(21)
        c, h, w = shape
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        e_c = jnp.asarray(rng.standard_normal((c, h2, w2)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        omegas = (0.9, 0.7, 0.8, 1.1, 0.6, 0.75)

        imp = pad_for_kernel(invm_for_kernel(um, dg), h, w)
        bp = pad_for_kernel(b, h, w)
        up = pad_for_kernel(u, h, w)

        # two-step oracle: masked prolong-add in XLA, then the plain kernel
        corr = _prolong(e_c, (c, h, w)) * um.astype(u.dtype)
        up_ref = up + pad_for_kernel(corr, h, w)
        want = slice_from_kernel(
            fused_jacobi_tpu_padded(
                up_ref, bp, imp, h, w, sweeps=6, omega=omegas
            ),
            h, w,
        )

        corr_half = corr_half_for_kernel(e_c, h, w)
        got = slice_from_kernel(
            fused_jacobi_corr_tpu_padded(
                up, bp, imp, corr_half, h, w, sweeps=6, omega=omegas
            ),
            h, w,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestBf16Degree:
    def test_bf16_operand_degree_exact(self):
        """bf16 operands store invm rounded (1/3 -> bf16 0.333984), so a raw
        in-kernel reciprocal would perturb deg=3 boundary cells to ~2.994;
        the kernel rounds the reconstruction, restoring the exact stencil.
        Oracle: the XLA sweep loop run in bf16 storage with exact integer
        degrees (ADVICE r4: bf16 parity at degree-3 boundary cells)."""
        import jax.numpy as jnp
        from jax import lax
        from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(7)
        c, h, w = 1, 520, 640
        u = jnp.asarray(rng.random((c, h, w)), jnp.bfloat16)
        b = jnp.asarray(rng.random((c, h, w)), jnp.bfloat16)
        # a mask with plenty of degree-1/2/3 boundary cells
        um_np = rng.random((h, w)) > 0.45
        um = jnp.asarray(um_np)
        dg = jnp.asarray(neighbor_degree((h, w)))

        # XLA oracle mirroring the kernel's exact precision contract:
        # bf16 storage in/out, ALL sweeps in f32 (one storage cast at the
        # end), Jacobi weight = the bf16-STORED reciprocal (inv0), operator
        # degree = the ROUNDED reconstruction (exact integers)
        from satellite_approximation_tpu.ops.pallas_kernels import invm_for_kernel

        invm16 = invm_for_kernel(um, dg).astype(jnp.bfloat16)
        inv0 = invm16.astype(jnp.float32)
        unknown = inv0 > 0
        dgf = jnp.where(unknown, jnp.round(1.0 / jnp.where(unknown, inv0, 1.0)), 1.0)
        bf = b.astype(jnp.float32)

        def body(_, uf):
            usel = jnp.where(unknown, uf, 0.0)
            p = jnp.pad(usel, ((0, 0), (1, 1), (1, 1)))
            ns = (
                p[:, :-2, 1:-1] + p[:, 2:, 1:-1] + p[:, 1:-1, :-2] + p[:, 1:-1, 2:]
            )
            au = dgf * uf - ns
            return jnp.where(unknown, uf + 0.8 * (bf - au) * inv0, uf)

        want = lax.fori_loop(0, 4, body, u.astype(jnp.float32)).astype(jnp.bfloat16)
        got = fused_jacobi_tpu(u, b, um, dg, sweeps=4, omega=0.8)
        # identical degrees -> the only differences are bf16 rounding of the
        # per-sweep outputs, which the oracle shares; require bit equality
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )


class TestResidualCascade:
    """Round-5 residual-cascade kernel vs the XLA TwoSum route — must be
    bit-equal (sign of zero aside, covered by ==) in the interior, with
    exact-zero tile pads."""

    def _problem(self, c=2, h=600, w=760, seed=11):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(seed)
        img = jnp.asarray((rng.random((c, h, w)) * 10000), jnp.float32)
        um_np = rng.random((h, w)) > 0.45
        um = jnp.asarray(um_np)
        dg = jnp.asarray(neighbor_degree((h, w)))
        return img, um, dg

    def _xla_residual(self, img, x_hi, x_lo, um, dg):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import fill as F

        umf = um.astype(jnp.float32)
        k = (4.0 - dg.astype(jnp.float32)) * umf
        known = img * (1.0 - umf)
        y_hi = known + x_hi
        hi_terms = list(F._shift_taps(y_hi)) + [-4.0 * x_hi, k * x_hi]
        s, c = F._cascade(hi_terms)
        l1, l2, l3, l4 = F._shift_taps(x_lo)
        lo = l1 + l2 + l3 + l4 - 4.0 * x_lo + k * x_lo
        return (s + (c + lo)) * umf

    def test_entry_matches_xla_bitwise(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.cg import shift_sum
        from satellite_approximation_tpu.ops.pallas_kernels import (
            invm_for_kernel, pad_for_kernel, residual_entry_tpu_padded,
        )

        img, um, dg = self._problem()
        c, h, w = img.shape
        umf = um.astype(jnp.float32)
        x_hi = img * umf
        x_lo = jnp.zeros_like(x_hi)
        want_r = np.asarray(self._xla_residual(img, x_hi, x_lo, um, dg))
        want_b = np.asarray(shift_sum(img * (1.0 - umf)) * umf)

        imgp = pad_for_kernel(img, h, w)
        pmd = pad_for_kernel(invm_for_kernel(um, dg), h, w)
        got_r, got_b = residual_entry_tpu_padded(imgp, pmd, h, w)
        got_r, got_b = np.asarray(got_r), np.asarray(got_b)
        np.testing.assert_array_equal(got_r[:, :h, :w], want_r)
        np.testing.assert_array_equal(got_b[:, :h, :w], want_b)
        # tile pads must be exact zeros (norms run over the full output)
        assert (got_r[:, h:, :] == 0).all() and (got_r[:, :, w:] == 0).all()
        assert (got_b[:, h:, :] == 0).all() and (got_b[:, :, w:] == 0).all()

    def test_pair_matches_xla_bitwise(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import (
            invm_for_kernel, pad_for_kernel, residual_pair_tpu_padded,
        )

        img, um, dg = self._problem(seed=12)
        c, h, w = img.shape
        rng = np.random.default_rng(13)
        umf = um.astype(jnp.float32)
        x_hi = jnp.asarray(rng.random((c, h, w)) * 9000, jnp.float32) * umf
        x_lo = jnp.asarray(
            rng.standard_normal((c, h, w)) * 1e-4, jnp.float32
        ) * umf
        want = np.asarray(self._xla_residual(img, x_hi, x_lo, um, dg))

        imgp = pad_for_kernel(img, h, w)
        pmd = pad_for_kernel(invm_for_kernel(um, dg), h, w)
        got = np.asarray(
            residual_pair_tpu_padded(
                imgp, pad_for_kernel(x_hi, h, w), pad_for_kernel(x_lo, h, w),
                pmd, h, w,
            )
        )
        np.testing.assert_array_equal(got[:, :h, :w], want)

    def test_bf16_invm_operand_exact(self):
        """A bf16 invm operand (the <=4096-grid preconditioner's padded
        level) must reconstruct the exact degrees — results identical to
        the f32 operand."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.pallas_kernels import (
            invm_for_kernel, pad_for_kernel, residual_entry_tpu_padded,
        )

        img, um, dg = self._problem(c=1, h=304, w=520, seed=14)
        h, w = um.shape
        imgp = pad_for_kernel(img, h, w)
        invm = invm_for_kernel(um, dg)
        a = residual_entry_tpu_padded(imgp, pad_for_kernel(invm, h, w), h, w)
        b = residual_entry_tpu_padded(
            imgp, pad_for_kernel(invm.astype(jnp.bfloat16), h, w), h, w
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


class TestHalfRestrict:
    def test_half_restrict_matches_row_pass_bitwise(self):
        """emit_residual="half": the zero-start kernel's in-VMEM restrict
        row pass (res[2i] + res[2i+1]) must equal the XLA pair sum of the
        full emitted residual BIT-FOR-BIT (same operand order)."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid as M
        from satellite_approximation_tpu.models.cg import neighbor_degree
        from satellite_approximation_tpu.ops.pallas_kernels import (
            fused_jacobi_zero_tpu,
        )

        rng = np.random.default_rng(9)
        c, h, w = 2, 600, 760  # even rows; ragged vs the 16/128 tile steps
        b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
        um = jnp.asarray(rng.random((h, w)) > 0.4)
        dg = jnp.asarray(neighbor_degree((h, w)))
        om = M._smoother_omegas(5)

        _, rp = fused_jacobi_zero_tpu(
            b, um, dg, sweeps=5, omega=om, emit_residual=True
        )
        _, rhalf = fused_jacobi_zero_tpu(
            b, um, dg, sweeps=5, omega=om, emit_residual="half"
        )
        want = np.asarray(rp)[:, 0::2, :] + np.asarray(rp)[:, 1::2, :]
        got = np.asarray(rhalf)[:, : h // 2, :w]
        np.testing.assert_array_equal(got, want)

    def test_vcycle_with_half_restrict_matches_xla_route(self):
        """The padded V-cycle route (zero-start + in-kernel half restrict +
        fused corr post-smooth) must still agree with the plain XLA
        V-cycle to f32 roundoff on the coarse-correction path."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid as M
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(10)
        h, w = 700, 640
        um_np = rng.random((h, w)) > 0.35
        um_np[0, :] = um_np[-1, :] = um_np[:, 0] = um_np[:, -1] = False
        hier = M._device_hierarchy(um_np, neighbor_degree((h, w)))
        r = jnp.asarray(rng.random((1, h, w)), jnp.float32) * jnp.asarray(
            um_np
        ).astype(jnp.float32)

        levels = tuple(
            (m_, d_.astype(jnp.float32)) for m_, d_ in hier.levels
        )
        pmd = M._padded_md_for_levels(levels)
        got = M._v_cycle(
            levels, r, jnp.zeros_like(r), 0, hier.coarse_inv, pmd,
            u_is_zero=True,
        )
        want = M._v_cycle(
            levels, r, jnp.zeros_like(r), 0, hier.coarse_inv, None,
            u_is_zero=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
