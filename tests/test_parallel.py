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


class TestHaloPadCols:
    def test_matches_global_zero_pad(self):
        """halo_pad_cols inside shard_map must reproduce what a global
        zero-pad then local slice would give: interior shards see their
        neighbours' edge columns, boundary shards see zeros."""
        import functools

        from satellite_approximation_tpu.parallel.halo import halo_pad_cols

        mesh = jax.make_mesh((4,), ("x",))
        h, w = 8, 32
        rng = np.random.default_rng(11)
        a = rng.random((h, w)).astype(np.float32)
        a_s = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(None, "x")))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P(None, "x"), out_specs=P(None, "x")
        )
        def run(x_l):
            padded = halo_pad_cols(x_l, "x")  # (h, wl + 2)
            # fold the ghosts back in so the output keeps the sharded width:
            # left ghost + own + right ghost summed three-point horizontally
            wl = x_l.shape[-1]
            return padded[:, 0:wl] + padded[:, 1 : wl + 1] + padded[:, 2 : wl + 2]

        got = np.asarray(jax.jit(run)(a_s))
        ap = np.pad(a, ((0, 0), (1, 1)))
        want = ap[:, 0:w] + ap[:, 1 : w + 1] + ap[:, 2 : w + 2]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_boundary_fill_value(self):
        import functools

        from satellite_approximation_tpu.parallel.halo import halo_pad_cols

        mesh = jax.make_mesh((2,), ("x",))
        a = jnp.ones((4, 8), jnp.float32)
        a_s = jax.device_put(a, NamedSharding(mesh, P(None, "x")))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P(None, "x"), out_specs=P(None, "x")
        )
        def run(x_l):
            p = halo_pad_cols(x_l, "x", boundary_value=7.0)
            return p[:, : x_l.shape[-1]]  # left ghost + all but last own col

        got = np.asarray(jax.jit(run)(a_s))
        # shard 0's left ghost is the boundary fill; shard 1's is shard 0's
        # edge column (1.0)
        assert got[0, 0] == 7.0
        assert got[0, 4] == 1.0


class TestSharded2D:
    """2-D ('b','y','x') spatial mesh (SURVEY §2.5 P6's stated design)."""

    def test_split_rows_cols_policy(self):
        from satellite_approximation_tpu.parallel.mesh import split_rows_cols

        assert split_rows_cols(8) == (4, 2)
        assert split_rows_cols(4) == (2, 2)
        assert split_rows_cols(16) == (4, 4)
        assert split_rows_cols(6) == (3, 2)
        assert split_rows_cols(7) == (7, 1)
        for n in (1, 2, 3, 4, 6, 8, 12, 16):
            y, x = split_rows_cols(n)
            assert y * x == n and y >= x

    def test_2d_matches_single_device(self):
        from satellite_approximation_tpu.parallel.mesh import spatial_mesh_2d
        from satellite_approximation_tpu.parallel.mg import sharded_mg_solve_2d

        mesh = spatial_mesh_2d(8)  # (1, 4, 2)
        assert mesh.shape == {"b": 1, "y": 4, "x": 2}
        rng = np.random.default_rng(12)
        c, h, w = 2, 256, 192
        umask = np.zeros((h, w), bool)
        umask[10:250, 8:180] = True
        deg = neighbor_degree((h, w))
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x, iters, rel = sharded_mg_solve_2d(
            b, np.zeros_like(b), umask, deg, mesh, tolerance=1e-7, max_iterations=200
        )
        assert np.all(np.asarray(rel) <= 1e-7)
        ref = solve_masked_poisson(
            b.astype(np.float64), umask, deg=deg, tolerance=1e-10,
            refinement_steps=4, max_iterations=50000,
        )
        np.testing.assert_allclose(np.asarray(x), ref.x, atol=1e-6)
        assert int(iters) > 0

    def test_2d_padding_path(self):
        # both dims non-divisible by the alignment: exercises 2-D padding
        from satellite_approximation_tpu.parallel.mesh import spatial_mesh_2d
        from satellite_approximation_tpu.parallel.mg import sharded_mg_solve_2d

        mesh = spatial_mesh_2d(4, shape=(1, 2, 2))
        rng = np.random.default_rng(13)
        c, h, w = 2, 250, 130
        umask = np.zeros((h, w), bool)
        umask[5:245, 5:125] = True
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x, iters, rel = sharded_mg_solve_2d(
            b, np.zeros_like(b), umask, None, mesh, tolerance=1e-6,
            max_iterations=200,
        )
        assert x.shape == (c, h, w)
        assert np.all(np.asarray(rel) <= 1e-6)

    def test_2d_fill_routes_through_mesh(self):
        from satellite_approximation_tpu.models.fill import laplace_fill
        from satellite_approximation_tpu.parallel.fill import sharded_fill
        from satellite_approximation_tpu.parallel.mesh import spatial_mesh_2d

        mesh = spatial_mesh_2d(4, shape=(1, 2, 2))
        rng = np.random.default_rng(14)
        h, w = 128, 96
        image = (rng.random((h, w)) * 50).astype(np.float64)
        umask = np.zeros((h, w), bool)
        umask[30:100, 20:80] = True
        filled, iters, rel = sharded_fill(image, umask, mesh, tolerance=1e-7)
        assert rel <= 1e-7
        filled = np.asarray(filled)
        np.testing.assert_array_equal(filled[~umask], image[~umask])
        ref = laplace_fill(
            image, umask, tolerance=1e-9, refinement_steps=4, device_output=False
        )
        np.testing.assert_allclose(filled, np.asarray(ref.x), atol=5e-5)

    def test_iteration_parity_2d_vs_rows_only(self):
        """At sizes where the hierarchy alignment makes padding a no-op, the
        (y=2,x=2) 2-D solve, the (y=2,x=1) degenerate-column solve, and the
        1-D row-sharded solve all run the SAME global operator, so iteration
        counts must be exactly equal (VERDICT r3 item 2's 'done' bar)."""
        from satellite_approximation_tpu.parallel.mesh import (
            spatial_band_mesh,
            spatial_mesh_2d,
        )
        from satellite_approximation_tpu.parallel.mg import (
            sharded_mg_solve,
            sharded_mg_solve_2d,
        )

        rng = np.random.default_rng(15)
        c, h, w = 2, 256, 256
        umask = np.zeros((h, w), bool)
        umask[16:240, 10:200] = True
        b = (rng.random((c, h, w)) * umask).astype(np.float32)
        x0 = np.zeros_like(b)

        runs = {}
        for label, solve, mesh in (
            ("2d_2x2", sharded_mg_solve_2d, spatial_mesh_2d(4, shape=(1, 2, 2))),
            ("2d_2x1", sharded_mg_solve_2d, spatial_mesh_2d(2, shape=(1, 2, 1))),
            ("rows_1d", sharded_mg_solve, spatial_band_mesh(2, shape=(1, 2))),
        ):
            x, iters, rel = solve(
                b, x0, umask, None, mesh, tolerance=1e-6, max_iterations=200
            )
            runs[label] = (np.asarray(x), int(iters), np.asarray(rel))
        iters = {k: v[1] for k, v in runs.items()}
        assert len(set(iters.values())) == 1, f"iteration counts differ: {iters}"
        assert np.all(runs["2d_2x2"][2] <= 1e-6)
        np.testing.assert_allclose(runs["2d_2x2"][0], runs["rows_1d"][0], atol=1e-8)

    def test_comm_volume_report_2d(self):
        from satellite_approximation_tpu.parallel.mg import (
            comm_volume_report,
            comm_volume_report_2d,
        )

        umask = np.zeros((1024, 1024), bool)
        umask[64:960, 64:900] = True
        r2 = comm_volume_report_2d(1024, 1024, 1, 4, 4, umask)
        r1 = comm_volume_report(1024, 1024, 1, 16, umask)
        assert r2["distributed_levels"] >= 2
        assert r2["bytes_per_pcg_iteration"] > 0
        # the point of the 2-D mesh: per-shard halo perimeter shrinks as
        # 4W/sqrt(N) while rows-only stays at 2W — at 16 devices the 2-D
        # tiling must move fewer halo bytes per shard per iteration
        assert r2["bytes_per_pcg_iteration"] < r1["bytes_per_pcg_iteration"]
        for (ly, lx) in r2["local_tile_per_level"]:
            assert ly >= 1 and lx >= 1


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


class TestShardedDetectStages:
    """The detection device stages beyond blur/pit-fill, sharded
    (parallel/detect.py): every stage must be BIT-EQUAL to the
    single-device jax route (reference pipeline: automatic_detection.cpp:80-236)."""

    def test_mini_detect_sharded_masks_bit_equal(self):
        from satellite_approximation_tpu.parallel.detect import mini_detect_sharded
        from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh

        mesh = spatial_band_mesh(8)
        out = mini_detect_sharded(mesh, n=256)
        # the harness itself asserts bit-equality per stage; sanity-check
        # the scene produced real work
        assert out["n_matched"] > 0
        assert out["final"].any()
        assert out["cloud"].any()

    def test_row_stages_pad_internally(self):
        """Row counts that do NOT divide the shard count (the real tile is
        10980 = 8k+4 rows, the test scene 1284) must pad internally and
        produce results bit-equal to the single-device stages (VERDICT r4
        item 2: the old ValueError guards made the sharded stages refuse
        every real scene)."""
        import jax

        from satellite_approximation_tpu.models.detection import refinement_jax
        from satellite_approximation_tpu.models.detection.refinement import (
            composite_surface,
            element_from_histogram,
        )
        from satellite_approximation_tpu.config import RefinementConfig
        from satellite_approximation_tpu.parallel.detect import (
            sharded_alpha_map,
            sharded_histograms,
            sharded_improved_shadow_mask,
            sharded_probability_map,
        )
        from satellite_approximation_tpu.parallel.mesh import spatial_band_mesh

        mesh = spatial_band_mesh(8)
        rng = np.random.default_rng(17)
        h, w = 237, 190  # 237 % 8 = 5: forces the padding path
        diff = rng.standard_normal((h, w)).astype(np.float32) * 0.01

        want_alpha = np.asarray(refinement_jax.alpha_map_jax(diff, 17.0, 0.007))
        got_alpha = np.asarray(sharded_alpha_map(diff, mesh, 17.0, 0.007))
        np.testing.assert_array_equal(want_alpha, got_alpha)

        alpha = rng.random((h, w)).astype(np.float32)
        beta = rng.random((h, w)).astype(np.float32)
        shadow = rng.random((h, w)) > 0.7
        cfg = RefinementConfig()
        divisions = tuple(cfg.histogram_divisions)
        want_h = refinement_jax._histograms_jax(
            alpha, beta, shadow.astype(np.float32), divisions
        )
        got_h = sharded_histograms(
            alpha, beta, shadow.astype(np.float32), divisions, mesh
        )
        for (wc, ws), (gc, gs) in zip(want_h, got_h):
            np.testing.assert_array_equal(np.asarray(wc), np.asarray(gc))
            np.testing.assert_array_equal(np.asarray(ws), np.asarray(gs))

        surface = composite_surface(
            [
                element_from_histogram(np.asarray(c), np.asarray(s))
                for c, s in want_h
            ],
            cfg,
        )
        cloud = rng.random((h, w)) > 0.8
        want_final = refinement_jax.improved_shadow_mask_jax(
            shadow, cloud, alpha, beta, surface, 0.15
        )
        got_final = sharded_improved_shadow_mask(
            shadow, cloud, alpha, beta, surface, 0.15, mesh
        )
        np.testing.assert_array_equal(np.asarray(want_final), np.asarray(got_final))

        # probability surface end-to-end through the sharded histograms
        want_surface = refinement_jax.probability_map_jax(shadow, alpha, beta, cfg)
        got_surface = sharded_probability_map(shadow, alpha, beta, mesh, cfg)
        np.testing.assert_array_equal(
            want_surface._extended(), got_surface._extended()
        )


class TestPublicApiMeshRouting:
    """SolverConfig.mesh="auto": the public fill APIs route through
    parallel/fill.sharded_fill on every visible device (VERDICT r4 item 3;
    reference surface src/main.cpp:46-58 is single-device). On the
    8-device CPU mesh the solve must actually shard and match the
    single-device route."""

    def _problem(self):
        rng = np.random.default_rng(31)
        h = w = 320
        img = (rng.random((2, h, w)) * 100).astype(np.float64)
        invalid = np.zeros((h, w), bool)
        invalid[10:290, 12:260] = True  # ~69k unknowns >= mg threshold
        return img, invalid

    def test_laplace_public_api_shards(self):
        from satellite_approximation_tpu.config import SolverConfig
        from satellite_approximation_tpu.models.laplace import solve_matrix

        img, invalid = self._problem()
        out_auto, res = solve_matrix(img, invalid, SolverConfig())
        # the solve ran sharded: the result payload is a device array laid
        # out over all 8 devices
        assert isinstance(res.x, jax.Array)
        assert len(res.x.sharding.device_set) == 8
        assert res.error <= 1e-8
        out_single, _ = solve_matrix(img, invalid, SolverConfig(mesh=None))
        np.testing.assert_allclose(out_auto, out_single, atol=1e-4)
        # known pixels untouched
        np.testing.assert_array_equal(out_auto[:, 0, :], img[:, 0, :])

    def test_poisson_public_api_shards(self, monkeypatch):
        from satellite_approximation_tpu.config import SolverConfig
        from satellite_approximation_tpu.models import poisson
        from satellite_approximation_tpu.parallel import fill as pfill

        img, invalid = self._problem()
        rng = np.random.default_rng(32)
        repl = (rng.random(img.shape) * 100).astype(np.float64)

        calls = {}
        real = pfill.sharded_fill

        def spy(*a, **k):
            out = real(*a, **k)
            calls["sharding"] = out[0].sharding
            calls["rel"] = out[2]
            return out

        monkeypatch.setattr(pfill, "sharded_fill", spy)
        # both routes certify their own RESIDUALS; the value comparison is
        # a routing guard, not an exactness claim — two distinct solutions
        # at the same residual may differ ~kappa*tol in value
        out_auto = poisson.blend_images_poisson(img, repl, invalid, tolerance=1e-9)
        assert calls, "public API did not route through sharded_fill"
        assert len(calls["sharding"].device_set) == 8
        assert calls["rel"] <= 1e-7
        out_single = poisson.blend_images_poisson(
            img, repl, invalid, tolerance=1e-9, config=SolverConfig(mesh=None)
        )
        np.testing.assert_allclose(out_auto, out_single, atol=1e-3)

    def test_small_solves_stay_single_device(self, monkeypatch):
        """Below mg_threshold_pixels the sharded route must NOT engage."""
        from satellite_approximation_tpu.models.laplace import solve_matrix
        from satellite_approximation_tpu.parallel import fill as pfill

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("sharded_fill called for a small solve")

        monkeypatch.setattr(pfill, "sharded_fill", boom)
        rng = np.random.default_rng(33)
        img = (rng.random((64, 64)) * 10).astype(np.float64)
        invalid = np.zeros((64, 64), bool)
        invalid[20:40, 20:40] = True
        out, _ = solve_matrix(img, invalid)
        assert np.isfinite(out).all()
