"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
CG must agree with the single-device solver, and the full sharded training
step must run under jit with real shardings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from satellite_approximation_tpu.models.cg import neighbor_degree, solve_masked_poisson
from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh
from satellite_approximation_tpu.parallel.solver import (
    sharded_masked_cg,
    sharded_training_step,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    return spatial_band_mesh(8)


def problem(mesh, c=4, h=64, w=48, seed=0):
    rng = np.random.default_rng(seed)
    umask = np.zeros((h, w), dtype=bool)
    umask[10:40, 8:40] = True
    umask[2, 2:6] = True  # a region near the shard boundary
    deg = neighbor_degree((h, w))
    b = (rng.random((c, h, w)) * umask).astype(np.float32)
    put = lambda x, spec: jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
    return (
        put(b, P("b", "x", None)),
        put(np.zeros_like(b), P("b", "x", None)),
        put(umask, P("x", None)),
        put(deg, P("x", None)),
        b,
        umask,
        deg,
    )


class TestMeshPolicy:
    def test_split_prefers_spatial_axis(self):
        from satellite_approximation_tpu.parallel.mesh import split_band_spatial

        for n in (1, 2, 3, 4, 6, 8, 12, 16, 24, 5, 7):
            b, x = split_band_spatial(n)
            assert b * x == n
            assert x >= b, f"spatial axis must dominate: n={n} -> ({b},{x})"
            assert b <= 4
        assert split_band_spatial(12) == (3, 4)
        assert split_band_spatial(8) == (2, 4)
        assert split_band_spatial(3) == (1, 3)

    def test_explicit_shape_override(self):
        from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh

        m = spatial_band_mesh(8, shape=(1, 8))
        assert m.shape == {"b": 1, "x": 8}
        m = spatial_band_mesh(6, shape=(2, 3))
        assert m.shape == {"b": 2, "x": 3}
        with pytest.raises(ValueError):
            spatial_band_mesh(8, shape=(2, 3))

    @pytest.mark.parametrize("n", [2, 3, 4, 6, 8])
    def test_builds_for_odd_counts(self, n):
        from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh

        m = spatial_band_mesh(n)
        assert m.shape["b"] * m.shape["x"] == n


class TestShardedCG:
    def test_matches_single_device(self, mesh):
        b_s, x0_s, um_s, deg_s, b, umask, deg = problem(mesh)
        x, iters, rs = sharded_masked_cg(
            b_s, x0_s, um_s, deg_s, mesh, tolerance=1e-7, max_iterations=4000
        )
        reference = solve_masked_poisson(
            b.astype(np.float64), umask, deg=deg, tolerance=1e-10, refinement_steps=3,
            max_iterations=20000,
        )
        np.testing.assert_allclose(np.asarray(x), reference.x, atol=5e-5)
        assert int(iters) > 0

    def test_residual_reported(self, mesh):
        b_s, x0_s, um_s, deg_s, b, umask, deg = problem(mesh, seed=3)
        x, iters, rs = sharded_masked_cg(
            b_s, x0_s, um_s, deg_s, mesh, tolerance=1e-5, max_iterations=4000
        )
        bs = (b * b).sum(axis=(-2, -1))
        assert (np.asarray(rs) <= 1e-10 * bs + 1e-12).all() or (
            np.asarray(rs) <= (1e-5**2) * bs * 1.01
        ).all()


class TestShardedTrainingStep:
    def test_runs_and_fills(self, mesh):
        c = 2 * mesh.shape["b"]
        h = 16 * mesh.shape["x"]
        w = 32
        rng = np.random.default_rng(5)
        inputs = rng.random((c, h, w)).astype(np.float32)
        repl = rng.random((c, h, w)).astype(np.float32)
        umask = np.zeros((h, w), dtype=bool)
        umask[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = True
        put = lambda x, spec: jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))
        step = jax.jit(sharded_training_step(mesh))
        out, rs = step(
            put(inputs, P("b", "x", None)),
            put(repl, P("b", "x", None)),
            put(umask, P("x", None)),
        )
        out = np.asarray(out)
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[:, ~umask], inputs[:, ~umask])
        assert np.abs(out[:, umask] - inputs[:, umask]).max() > 1e-6


class TestShardedMultigrid:
    def test_matches_single_device(self, mesh):
        from satellite_approximation_tpu.parallel.mg import sharded_mg_solve

        rng = np.random.default_rng(2)
        c, h, w = 4, 256, 192
        umask = np.zeros((h, w), bool)
        umask[10:250, 8:180] = True
        deg = neighbor_degree((h, w))
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x, iters, rel = sharded_mg_solve(
            b, np.zeros_like(b), umask, deg, mesh, tolerance=1e-7, max_iterations=200
        )
        assert np.all(np.asarray(rel) <= 1e-7)
        ref = solve_masked_poisson(
            b.astype(np.float64), umask, deg=deg, tolerance=1e-10,
            refinement_steps=4, max_iterations=50000,
        )
        np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-6)
        assert int(iters) > 0

    def test_row_padding_path(self, mesh):
        # H=250 not divisible by xdim*2^depth: exercises the alignment padding
        from satellite_approximation_tpu.parallel.mg import sharded_mg_solve

        rng = np.random.default_rng(3)
        c, h, w = 2, 250, 130
        umask = np.zeros((h, w), bool)
        umask[5:245, 5:125] = True
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x, iters, rel = sharded_mg_solve(
            b, np.zeros_like(b), umask, None, mesh, tolerance=1e-6, max_iterations=200
        )
        assert x.shape == (c, h, w)
        assert np.all(np.asarray(rel) <= 1e-6)


class TestShardedFill:
    def test_laplace_matches_single_device(self, mesh):
        from satellite_approximation_tpu.models.fill import laplace_fill
        from satellite_approximation_tpu.parallel.fill import sharded_fill

        rng = np.random.default_rng(9)
        c, h, w = 2, 200, 160
        image = (rng.random((c, h, w)) * 100).astype(np.float64)
        umask = np.zeros((h, w), bool)
        umask[40:160, 30:130] = True
        umask[5:9, 100:140] = True  # region crossing a shard boundary

        filled, iters, rel = sharded_fill(image, umask, mesh, tolerance=1e-7)
        assert rel <= 1e-7
        assert int(iters) > 0
        filled = np.asarray(filled)
        np.testing.assert_array_equal(filled[:, ~umask], image[:, ~umask])

        ref = laplace_fill(
            image, umask, tolerance=1e-9, refinement_steps=4, device_output=False
        )
        np.testing.assert_allclose(filled, np.asarray(ref.x), atol=5e-5)

    def test_poisson_matches_single_device(self, mesh):
        from satellite_approximation_tpu.models.fill import laplace_fill
        from satellite_approximation_tpu.parallel.fill import sharded_fill

        rng = np.random.default_rng(10)
        h, w = 128, 96
        image = (rng.random((h, w)) * 50).astype(np.float64)
        repl = (rng.random((h, w)) * 50 + 20).astype(np.float64)
        umask = np.zeros((h, w), bool)
        umask[30:100, 20:80] = True

        filled, iters, rel = sharded_fill(
            image, umask, mesh, replacement=repl, tolerance=1e-7
        )
        assert rel <= 1e-7
        filled = np.asarray(filled)
        assert filled.shape == (h, w)
        np.testing.assert_array_equal(filled[~umask], image[~umask])

        ref = laplace_fill(
            image, umask, replacement=repl, tolerance=1e-9,
            refinement_steps=4, device_output=False,
        )
        np.testing.assert_allclose(filled, np.asarray(ref.x), atol=5e-5)


class TestShardedStencils:
    """Sharded forms of the two reference GPU kernels (parallel/stencils)."""

    def test_blur_bit_identical(self, mesh):
        from satellite_approximation_tpu.ops.blur import gaussian_blur
        from satellite_approximation_tpu.parallel.stencils import sharded_gaussian_blur

        rng = np.random.default_rng(3)
        for sigma, shape in ((4.0, (128, 96)), (1.0, (2, 64, 80))):
            img = rng.random(shape).astype(np.float32)
            want = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
            got = np.asarray(sharded_gaussian_blur(img, sigma, mesh))
            np.testing.assert_array_equal(got, want)

    def test_blur_rejects_too_few_rows(self, mesh):
        from satellite_approximation_tpu.parallel.stencils import sharded_gaussian_blur

        with pytest.raises(ValueError):
            sharded_gaussian_blur(np.zeros((16, 32), np.float32), 4.0, mesh)

    def test_pit_fill_bit_identical(self, mesh):
        from satellite_approximation_tpu.ops.pitfill import pit_fill
        from satellite_approximation_tpu.parallel.stencils import sharded_pit_fill

        rng = np.random.default_rng(4)
        img = rng.random((64, 56)).astype(np.float32)
        img[20:30, 20:30] -= 0.5  # a deep pit spanning shard boundaries
        want = np.asarray(pit_fill(jnp.asarray(img), 0.3))
        got = np.asarray(sharded_pit_fill(img, 0.3, mesh))
        np.testing.assert_array_equal(got, want)


class TestShardingConvergenceParity:
    def test_iteration_count_independent_of_sharding(self):
        """Spatial sharding must not change the numerics: the sharded MG-PCG
        at xdim=4 runs the same operator as xdim=1 (same Chebyshev weights,
        same replicated tail, same dense coarse solve), so iteration counts
        and residuals must match exactly (SURVEY §2.5 P6)."""
        from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh
        from satellite_approximation_tpu.parallel.mg import sharded_mg_solve

        rng = np.random.default_rng(5)
        h, w, c = 128, 96, 2
        umask = np.zeros((h, w), bool)
        umask[16:112, 10:86] = True
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x0 = np.zeros_like(b)

        results = {}
        for xdim in (1, 4):
            mesh = spatial_band_mesh(2 * xdim, shape=(2, xdim))
            x, iters, rel = sharded_mg_solve(
                b, x0, umask, None, mesh, tolerance=1e-6, max_iterations=200
            )
            results[xdim] = (np.asarray(x), int(iters), np.asarray(rel))
        assert results[1][1] == results[4][1], (
            f"iteration counts differ across sharding: {results[1][1]} vs "
            f"{results[4][1]}"
        )
        assert np.all(results[4][2] <= 1e-6)
        np.testing.assert_allclose(results[1][0], results[4][0], atol=1e-8)
