"""Laplace/Poisson solver validation against the scipy sparse oracle
(BASELINE parity target: 1e-5 per-pixel)."""

import numpy as np
import pytest

from oracle_solvers import laplace_fill_oracle, poisson_blend_oracle

from satellite_approximation_tpu.models.laplace import (
    fill_missing_portion_smooth_boundary,
    apply_laplace,
    solve_matrix,
)
from satellite_approximation_tpu.models.poisson import (
    blend_images_poisson,
    valid_pixel_mask,
)

rng = np.random.default_rng(7)


def smooth_image(h, w, seed=0):
    r = np.random.default_rng(seed)
    x = r.random((h, w))
    for _ in range(8):
        x = 0.25 * (np.roll(x, 1, 0) + np.roll(x, -1, 0) + np.roll(x, 1, 1) + np.roll(x, -1, 1))
    return x


def blob_mask(h, w, seed=1, frac=0.08):
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), dtype=bool)
    for _ in range(4):
        cy, cx = r.integers(5, h - 5), r.integers(5, w - 5)
        ry, rx = r.integers(2, max(h // 6, 3)), r.integers(2, max(w // 6, 3))
        yy, xx = np.ogrid[:h, :w]
        m |= ((yy - cy) / max(ry, 1)) ** 2 + ((xx - cx) / max(rx, 1)) ** 2 <= 1.0
    return m


class TestLaplace:
    def test_matches_oracle(self):
        img = smooth_image(40, 50)
        mask = blob_mask(40, 50)
        ours = fill_missing_portion_smooth_boundary(img.copy(), mask)
        oracle = laplace_fill_oracle(img, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-5)

    def test_residual(self):
        img = smooth_image(30, 30, seed=3)
        mask = blob_mask(30, 30, seed=4)
        filled, info = solve_matrix(img.copy(), mask)
        assert info.error < 1e-6
        # interior masked pixels satisfy the 5-point Laplace equation
        interior = mask.copy()
        interior[0, :] = interior[-1, :] = interior[:, 0] = interior[:, -1] = False
        lap = (
            np.roll(filled, 1, 0) + np.roll(filled, -1, 0)
            + np.roll(filled, 1, 1) + np.roll(filled, -1, 1)
            - 4 * filled
        )
        assert np.abs(lap[interior]).max() < 1e-5

    def test_mask_on_border(self):
        # invalid pixels on the image border are treated as known (pinned)
        img = smooth_image(20, 20, seed=5)
        mask = np.zeros((20, 20), dtype=bool)
        mask[0, 5:9] = True  # border — stays untouched
        mask[10:13, 10:13] = True
        ours = fill_missing_portion_smooth_boundary(img.copy(), mask)
        oracle = laplace_fill_oracle(img, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-5)
        np.testing.assert_array_equal(ours[0, 5:9], img[0, 5:9])

    def test_no_invalid_pixels(self):
        img = smooth_image(10, 10)
        out = fill_missing_portion_smooth_boundary(img.copy(), np.zeros((10, 10), bool))
        np.testing.assert_array_equal(out, img)

    def test_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            fill_missing_portion_smooth_boundary(np.zeros((5, 5)), np.zeros((4, 4), bool))

    def test_multichannel_batch(self):
        imgs = np.stack([smooth_image(24, 24, seed=s) for s in range(3)])
        mask = blob_mask(24, 24, seed=9)
        ours, _ = solve_matrix(imgs, mask)
        for c in range(3):
            oracle = laplace_fill_oracle(imgs[c], mask)
            np.testing.assert_allclose(ours[c], oracle, atol=1e-5)

    def test_apply_laplace_marker_semantics(self):
        img = np.stack([smooth_image(20, 20, seed=s) for s in range(3)], axis=-1) * 255
        marker = np.zeros((20, 20, 3), dtype=np.uint8)
        marker[8:12, 8:12, 0] = 255  # red
        out = apply_laplace(img, marker, red_threshold=220)
        assert out.shape == img.shape
        changed = np.abs(out - img).sum(axis=-1) > 1e-9
        expected = np.zeros((20, 20), bool)
        expected[8:12, 8:12] = True
        np.testing.assert_array_equal(changed, expected)


class TestDeviceAssemblyPolicy:
    """The three device_assembly policies (SolverConfig) agree with the
    oracle: "auto" fuses only for f32-exact inputs, "force" fuses always
    (f32 input rounding stays far below the solve tolerance), "never"
    keeps host assembly."""

    def _cfg(self, policy):
        import dataclasses

        from satellite_approximation_tpu.config import DEFAULT_SOLVER

        return dataclasses.replace(DEFAULT_SOLVER, device_assembly=policy)

    def test_laplace_auto_fused_for_u8_inputs(self):
        # u8-quantized image: exactly f32-representable -> fused device path
        img = np.round(smooth_image(40, 50) * 255.0)
        mask = blob_mask(40, 50)
        ours = fill_missing_portion_smooth_boundary(img.copy(), mask)
        oracle = laplace_fill_oracle(img, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-5)
        np.testing.assert_array_equal(ours[~mask], img[~mask])

    def test_laplace_force_matches_never(self):
        img = smooth_image(40, 50)  # f64, NOT f32-exact
        mask = blob_mask(40, 50)
        forced, info_f = solve_matrix(img.copy(), mask, self._cfg("force"))
        host, info_h = solve_matrix(img.copy(), mask, self._cfg("never"))
        assert info_f.error < 1e-6 and info_h.error < 1e-6
        np.testing.assert_allclose(forced, host, atol=1e-5)
        np.testing.assert_array_equal(forced[~mask], img[~mask])

    def test_poisson_auto_fused_for_u8_inputs(self):
        h, w = 36, 44
        inputs = np.stack([np.round(smooth_image(h, w, seed=s) * 255) for s in range(3)])
        repl = np.stack([np.round(smooth_image(h, w, seed=s + 10) * 255) for s in range(3)])
        mask = blob_mask(h, w, seed=11)
        ours = blend_images_poisson(inputs, repl, invalid_mask=mask, tolerance=1e-10)
        oracle = poisson_blend_oracle(inputs, repl, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-4)
        np.testing.assert_array_equal(ours[:, ~mask], inputs[:, ~mask])

    def test_poisson_force_matches_oracle(self):
        h, w = 36, 44
        inputs = np.stack([smooth_image(h, w, seed=s) for s in range(2)])
        repl = np.stack([smooth_image(h, w, seed=s + 10) for s in range(2)])
        mask = blob_mask(h, w, seed=11)
        ours = blend_images_poisson(
            inputs, repl, invalid_mask=mask, tolerance=1e-8, config=self._cfg("force")
        )
        oracle = poisson_blend_oracle(inputs, repl, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-4)
        np.testing.assert_array_equal(ours[:, ~mask], inputs[:, ~mask])


class TestPoisson:
    def test_mask_overload_matches_oracle(self):
        h, w = 36, 44
        inputs = np.stack([smooth_image(h, w, seed=s) for s in range(3)])
        repl = np.stack([smooth_image(h, w, seed=s + 10) for s in range(3)])
        mask = blob_mask(h, w, seed=11)
        ours = blend_images_poisson(inputs, repl, invalid_mask=mask, tolerance=1e-10)
        oracle = poisson_blend_oracle(inputs, repl, mask)
        np.testing.assert_allclose(ours, oracle, atol=1e-5)

    def test_known_pixels_untouched(self):
        h, w = 20, 20
        inputs = np.stack([smooth_image(h, w, seed=s) for s in range(2)])
        repl = np.stack([smooth_image(h, w, seed=s + 5) for s in range(2)])
        mask = blob_mask(h, w, seed=6)
        out = blend_images_poisson(inputs, repl, invalid_mask=mask)
        np.testing.assert_array_equal(out[:, ~mask], inputs[:, ~mask])

    def test_constant_guidance_reduces_to_laplace_interp(self):
        # with a constant replacement, gradients vanish: the solve is the
        # membrane interpolant of the boundary
        h, w = 24, 24
        inputs = np.stack([smooth_image(h, w, seed=1)])
        repl = np.full((1, h, w), 0.5)
        mask = np.zeros((h, w), bool)
        mask[8:16, 8:16] = True
        out = blend_images_poisson(inputs, repl, invalid_mask=mask, tolerance=1e-10)
        oracle = poisson_blend_oracle(inputs, repl, mask)
        np.testing.assert_allclose(out, oracle, atol=1e-6)

    def test_offset_overload(self):
        # seamless clone of a small patch into a larger image
        ih, iw, rh, rw = 40, 40, 12, 14
        inputs = np.stack([smooth_image(ih, iw, seed=s) for s in range(3)])
        repl = np.stack([smooth_image(rh, rw, seed=s + 3) for s in range(3)])
        # white-out a corner (sentinel): those pixels are NOT blended
        repl[:, :3, :3] = 1.0
        out = blend_images_poisson(inputs, repl, start_row=5, start_column=7)
        mask = valid_pixel_mask(repl)
        assert not mask[0, 0]
        window = out[:, 5 : 5 + rh, 7 : 7 + rw]
        np.testing.assert_array_equal(window[:, ~mask], inputs[:, 5 : 5 + rh, 7 : 7 + rw][:, ~mask])
        assert np.abs(window[:, mask] - inputs[:, 5 : 5 + rh, 7 : 7 + rw][:, mask]).max() > 1e-8

    def test_list_api_roundtrip(self):
        h, w = 16, 16
        inputs = [smooth_image(h, w, seed=s) for s in range(3)]
        repl = [smooth_image(h, w, seed=s + 7) for s in range(3)]
        mask = blob_mask(h, w, seed=8)
        out = blend_images_poisson(inputs, repl, invalid_mask=mask)
        assert isinstance(out, list) and len(out) == 3
        assert out[0].shape == (h, w)

    def test_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            blend_images_poisson(
                np.zeros((1, 5, 5)), np.zeros((1, 4, 4)), invalid_mask=np.zeros((5, 5), bool)
            )

    def test_perf_info_written(self, tmp_path):
        h, w = 16, 16
        inputs = np.stack([smooth_image(h, w, seed=1)])
        repl = np.stack([smooth_image(h, w, seed=2)])
        mask = blob_mask(h, w, seed=3)
        path = tmp_path / "perf.csv"
        blend_images_poisson(inputs, repl, invalid_mask=mask, perf_path=path)
        line = path.read_text().strip().split(",")
        assert int(line[0]) == int(mask.sum())
        assert float(line[1]) == 1e-6


class TestMultigrid:
    def test_matches_cg(self):
        from satellite_approximation_tpu.models import multigrid
        from satellite_approximation_tpu.models.cg import solve_masked_poisson

        h = w = 96
        umask = np.zeros((h, w), bool)
        umask[10:86, 12:80] = True
        umask[40:46, :12] = False
        img = np.stack([smooth_image(h, w, seed=s) for s in range(3)])
        known = img * (~umask)
        p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
        b = (
            p[:, 0:h, 1 : w + 1] + p[:, 2 : h + 2, 1 : w + 1]
            + p[:, 1 : h + 1, 0:w] + p[:, 1 : h + 1, 2 : w + 2]
        ) * umask
        mg = multigrid.solve(b, umask, tolerance=1e-8, refinement_steps=3)
        cg = solve_masked_poisson(
            b, umask, tolerance=1e-9, refinement_steps=3, max_iterations=50000
        )
        assert mg.error < 1e-8
        np.testing.assert_allclose(mg.x, cg.x, atol=1e-6)

    def test_far_fewer_iterations_than_cg(self):
        from satellite_approximation_tpu.models import multigrid
        from satellite_approximation_tpu.models.cg import solve_masked_poisson

        h = w = 128
        umask = np.zeros((h, w), bool)
        umask[4:124, 4:124] = True  # large region: CG needs O(diameter) iters
        b = (np.random.default_rng(0).random((1, h, w)) * umask).astype(np.float64)
        mg = multigrid.solve(b, umask, tolerance=1e-6, refinement_steps=2)
        cg = solve_masked_poisson(
            b, umask, tolerance=1e-6, refinement_steps=2, max_iterations=50000
        )
        assert mg.error < 1e-6
        assert mg.iterations < cg.iterations / 4

    def test_hierarchy_shapes(self):
        from satellite_approximation_tpu.models.multigrid import build_hierarchy
        from satellite_approximation_tpu.models.cg import neighbor_degree

        m = np.zeros((100, 140), bool)
        m[10:90, 10:120] = True
        levels = build_hierarchy(m, neighbor_degree((100, 140)))
        assert levels[0][0].shape == (100, 140)
        assert levels[1][0].shape == (50, 70)
        # all-pooling: coarse cells whose whole 2x2 block is unknown stay
        # unknown; blocks touching the known rim become known (the mask
        # SHRINKS — any-pooling's growth made the V-cycle divergent, see
        # the multigrid module docstring)
        assert levels[1][0][5:45, 5:60].all()
        assert not levels[1][0][:5, :].any() and not levels[1][0][45:, :].any()
        # a half-covered block (fine rows 9:90 -> block 4 = rows 8,9) is
        # known under all-pooling, unknown under any-pooling
        m2 = np.zeros((100, 140), bool)
        m2[9:90, 10:120] = True
        levels2 = build_hierarchy(m2, neighbor_degree((100, 140)))
        assert not levels2[1][0][4, :].any()


class TestDeviceHierarchy:
    """The on-device hierarchy builder must reproduce the host builder
    exactly (multigrid._build_levels_device vs build_hierarchy)."""

    @pytest.mark.parametrize(
        "shape,seed", [((130, 97), 0), ((256, 256), 1), ((77, 530), 2)]
    )
    def test_matches_host_builder(self, shape, seed):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(seed)
        m = rng.random(shape) > 0.6
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
        host = multigrid.build_hierarchy(m, neighbor_degree(shape))
        dev = multigrid._build_levels_device(jnp.asarray(m))
        assert len(host) - 1 == len(dev)
        for k, (hm, hd) in enumerate(host[1:]):
            np.testing.assert_array_equal(np.asarray(dev[k][0]), hm)
            np.testing.assert_allclose(np.asarray(dev[k][1]), hd)

    def test_saturating_mask_ladder(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid
        from satellite_approximation_tpu.models.cg import neighbor_degree

        m = np.ones((300, 300), bool)
        m[0, 0] = False
        host = multigrid.build_hierarchy(m, neighbor_degree(m.shape))
        dev = multigrid._build_levels_device(jnp.asarray(m))
        for k, (hm, hd) in enumerate(host[1:]):
            np.testing.assert_array_equal(np.asarray(dev[k][0]), hm)
            np.testing.assert_allclose(np.asarray(dev[k][1]), hd)

    def test_device_checksum_exact(self):
        """The device-mask cache key is an exact content checksum: any
        single-pixel flip must change it (the 3-moment fingerprint this
        replaced could collide and silently reuse a wrong hierarchy)."""
        import jax
        import jax.numpy as jnp
        from satellite_approximation_tpu.models import multigrid

        rng = np.random.default_rng(7)
        m = rng.random((97, 131)) > 0.5
        base = tuple(
            int(v) for v in jax.device_get(
                multigrid._mask_checksum_device(jnp.asarray(m))
            )
        )
        # same content, independent upload -> same key
        again = tuple(
            int(v) for v in jax.device_get(
                multigrid._mask_checksum_device(jnp.asarray(m.copy()))
            )
        )
        assert base == again
        for (i, j) in [(0, 0), (96, 130), (50, 64), (13, 99)]:
            m2 = m.copy()
            m2[i, j] = not m2[i, j]
            h = tuple(
                int(v) for v in jax.device_get(
                    multigrid._mask_checksum_device(jnp.asarray(m2))
                )
            )
            assert h != base, (i, j)

    def test_cache_lru_no_churn(self):
        """Alternating between a few masks must not rebuild hierarchies:
        LRU eviction (not wholesale clears) keeps the working set cached."""
        from satellite_approximation_tpu.models import multigrid
        from satellite_approximation_tpu.models.cg import neighbor_degree

        rng = np.random.default_rng(3)
        masks = []
        for s in range(3):
            m = rng.random((64, 64)) > 0.7
            m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = False
            masks.append(m)
        deg = neighbor_degree((64, 64))
        multigrid._HIERARCHY_CACHE.clear()
        hiers = [multigrid._device_hierarchy(m, deg) for m in masks]
        # two more alternating rounds: every lookup must hit the cache
        for _ in range(2):
            for m, h0 in zip(masks, hiers):
                h1 = multigrid._device_hierarchy(m, deg)
                assert h1.levels[1][0] is h0.levels[1][0], "hierarchy rebuilt"

    def test_cache_lru_evicts_oldest_only(self):
        from satellite_approximation_tpu.models import multigrid

        multigrid._CONST_CACHE.clear()
        arrs = [np.full((8, 8), float(i), np.float32) for i in range(20)]
        for a in arrs:
            multigrid.device_constant(a)
        assert len(multigrid._CONST_CACHE) == multigrid._CONST_CACHE_CAP
        # the most recent CAP entries survive
        v = multigrid.device_constant(arrs[-1])
        assert float(np.asarray(v)[0, 0]) == 19.0
        assert len(multigrid._CONST_CACHE) == multigrid._CONST_CACHE_CAP


class TestLaplaceFill:
    """Device-first full-tile fill path (models/fill.py)."""

    def _problem(self):
        rng = np.random.default_rng(0)
        img = rng.random((5, 96, 80)).astype(np.float32)
        m = np.zeros((96, 80), bool)
        m[20:70, 15:60] = True
        return img, m

    def test_matches_host_assembled_solve(self):
        from satellite_approximation_tpu.models.fill import laplace_fill
        from satellite_approximation_tpu.models.cg import solve_masked_poisson

        img, m = self._problem()
        r = laplace_fill(img, m, tolerance=1e-8, device_output=False)
        known = img.astype(np.float64) * (~m)
        p = np.pad(known, ((0, 0), (1, 1), (1, 1)))
        H, W = m.shape
        b = (
            p[:, 0:H, 1 : W + 1] + p[:, 2 : H + 2, 1 : W + 1]
            + p[:, 1 : H + 1, 0:W] + p[:, 1 : H + 1, 2 : W + 2]
        ) * m
        oracle = solve_masked_poisson(b, m, tolerance=1e-10, refinement_steps=4)
        expect = img * (~m) + oracle.x.astype(np.float32) * m
        np.testing.assert_allclose(r.x, expect, atol=2e-5)
        np.testing.assert_array_equal(r.x[:, ~m], img[:, ~m])
        assert r.error < 1e-8

    def test_chunked_equals_single(self):
        from satellite_approximation_tpu.models.fill import laplace_fill

        img, m = self._problem()
        whole = laplace_fill(img, m, tolerance=1e-8, device_output=False)
        chunked = laplace_fill(
            img, m, tolerance=1e-8, device_output=False,
            max_chunk_elements=2 * 96 * 80,
        )
        np.testing.assert_allclose(chunked.x, whole.x, atol=1e-6)

    def test_band_sink_streams_all_chunks(self):
        from satellite_approximation_tpu.models.fill import laplace_fill

        img, m = self._problem()
        got = {}

        def sink(s, e, chunk):
            got[(s, e)] = np.asarray(chunk)

        r = laplace_fill(
            img, m, tolerance=1e-8, max_chunk_elements=2 * 96 * 80,
            band_sink=sink,
        )
        assert r.x is None
        whole = laplace_fill(img, m, tolerance=1e-8, device_output=False)
        stitched = np.concatenate([got[k] for k in sorted(got)], axis=0)
        np.testing.assert_allclose(stitched, whole.x, atol=1e-6)

    def test_2d_squeeze(self):
        from satellite_approximation_tpu.models.fill import laplace_fill

        img, m = self._problem()
        r = laplace_fill(img[0], m, tolerance=1e-7, device_output=False)
        assert r.x.shape == m.shape

    def test_composite_fuse_gated_above_verified_ceiling(self):
        """Above _COMPOSITE_FUSE_LIMIT the chunk solve must emit the
        (x_hi, x_lo) pair and composite in a SECOND dispatch: the fused
        emit="composite" program miscompiles at 10980^2 on the TPU
        toolchain (refinement loop eliminated; iters 0 / rnorm 0 exactly).
        Routing is asserted by spying on the emit argument; below the
        ceiling the fused emit is used, and results must match between the
        two routes."""
        from satellite_approximation_tpu.models import fill as F

        img, m = self._problem()
        seen = []
        orig = F._fused_refine_solve

        def spy(*args, **kw):
            seen.append(kw.get("emit"))
            return orig(*args, **kw)

        old_limit = F._COMPOSITE_FUSE_LIMIT
        try:
            F._fused_refine_solve = spy
            small = F.laplace_fill(img, m, tolerance=1e-8, device_output=False)
            assert seen and all(e == "composite" for e in seen)
            seen.clear()
            F._COMPOSITE_FUSE_LIMIT = img[0].size - 1  # force the big-grid route
            big = F.laplace_fill(img, m, tolerance=1e-8, device_output=False)
            assert seen and all(e == "pair" for e in seen)
        finally:
            F._fused_refine_solve = orig
            F._COMPOSITE_FUSE_LIMIT = old_limit
        np.testing.assert_allclose(big.x, small.x, atol=1e-6)
        assert big.error < 1e-8 and big.iterations > 0

    def test_u16_upload_matches_f32(self):
        """Integer rasters upload in their own dtype (half the H2D bytes)
        and cast on device — results identical to the f32 upload."""
        from satellite_approximation_tpu.models.fill import laplace_fill

        rng = np.random.default_rng(4)
        img16 = (rng.random((2, 96, 80)) * 60000).astype(np.uint16)
        m = np.zeros((96, 80), bool)
        m[20:70, 15:60] = True
        a = laplace_fill(img16, m, tolerance=1e-8, device_output=False)
        b = laplace_fill(
            img16.astype(np.float32), m, tolerance=1e-8, device_output=False
        )
        assert a.x.dtype == np.float32
        np.testing.assert_array_equal(a.x, b.x)
        # integer replacement too (Poisson mode)
        rep16 = (rng.random((2, 96, 80)) * 60000).astype(np.uint16)
        ap = laplace_fill(
            img16, m, replacement=rep16, tolerance=1e-8, device_output=False
        )
        bp = laplace_fill(
            img16.astype(np.float32), m,
            replacement=rep16.astype(np.float32),
            tolerance=1e-8, device_output=False,
        )
        np.testing.assert_array_equal(ap.x, bp.x)
