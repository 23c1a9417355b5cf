"""Detection-pipeline unit/parity tests on small synthetic scenes, with
pure-Python loop oracles ported from the reference's per-pixel code."""

import numpy as np
import pytest

import oracle_detection as od

from satellite_approximation_tpu.config import MatchingConfig, RefinementConfig
from satellite_approximation_tpu.models.detection import cloud_mask as cm
from satellite_approximation_tpu.models.detection import matching, refinement
from satellite_approximation_tpu.ops import geometry

rng = np.random.default_rng(21)


def make_scene(h=96, w=128, diag=10.0, n_clouds=3, seed=5):
    """Synthetic scene: a few rectangular clouds + a potential-shadow field
    displaced roughly along -x (sun in the +x direction)."""
    r = np.random.default_rng(seed)
    mask = np.zeros((h, w), dtype=bool)
    for _ in range(n_clouds):
        cy, cx = int(r.integers(18, h - 26)), int(r.integers(30, w - 30))
        hh, ww = int(r.integers(4, 9)), int(r.integers(4, 10))
        mask[cy : cy + hh, cx : cx + ww] = True
    cmap, clouds = cm.partition_cloud_mask(mask, diag, 3)

    # sun to the east, satellite overhead
    sun_pos = np.array([2.0e8, 1.0e8, 1.5e9])
    view_pos = np.array([0.05, 0.1, 785.0])

    # potential shadows: clouds shifted by the displacement a ~2km cloud casts
    shift_px = 14
    psm = np.zeros_like(mask)
    psm[:, :-shift_px] = mask[:, shift_px:]
    psm |= r.random((h, w)) > 0.96
    psm &= ~mask
    return mask, cmap, clouds, psm, sun_pos, view_pos, diag


class TestCastTransforms:
    def test_matches_oracle(self):
        mask, cmap, clouds, psm, sun, view, diag = make_scene()
        h, w = mask.shape
        heights = np.array([0.5, 2.0, 7.5])
        a2, delta, bounds, m_all = matching._cast_transforms(
            clouds, heights, (h, w), diag, sun, view
        )
        for k, cloud in enumerate(clouds):
            for n, z in enumerate(heights):
                m_o = od.cast_transform_oracle(cloud.quad.corners(), z, sun, view)
                np.testing.assert_allclose(m_all[k, n], m_o, rtol=1e-8, atol=1e-10)

    def test_height_sweep_f32_accumulation(self):
        hs = matching.height_sweep(MatchingConfig())
        assert hs[0] == pytest.approx(0.2)
        assert abs(hs[1] - 0.225) < 1e-6
        assert len(hs) in (472, 473)  # f32 accumulation decides the last step
        assert hs[-1] <= 12.0 + 1e-6


class TestMatching:
    def test_similarity_matches_loop_oracle(self):
        mask, cmap, clouds, psm, sun, view, diag = make_scene()
        h, w = mask.shape
        res = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, diag, sun, view
        )
        heights = matching.height_sweep(MatchingConfig())
        # verify the reported best (height, similarity) against the oracle
        for cloud in clouds:
            sol = res.solutions[cloud.id]
            best_sim = -1.0
            best_h = 0.0
            for z in heights:
                m_o = od.cast_transform_oracle(cloud.quad.corners(), z, sun, view)
                sim, hits, _ = od.similarity_comparison_oracle(
                    cloud.id, cloud.quad.corners(), m_o, cmap, mask, psm, diag
                )
                if sim > best_sim:
                    best_sim, best_h, best_hits = sim, z, hits
            if best_sim < 0.3:
                assert sol.similarity == -1.0
                assert res.shadows[cloud.id].window is None
            else:
                assert sol.similarity == pytest.approx(best_sim, abs=1e-6)
                assert sol.height == pytest.approx(best_h, abs=1e-9)
                shadow = res.shadows[cloud.id]
                got = set()
                ax, ay = shadow.anchor
                ys, xs = np.nonzero(shadow.window)
                for y, x in zip(ys, xs):
                    got.add((int(x + ax), int(y + ay)))
                assert got == set(best_hits)

    def test_shadow_mask_is_union_of_hits(self):
        mask, cmap, clouds, psm, sun, view, diag = make_scene(seed=9)
        res = matching.match_clouds_shadows(clouds, cmap, mask, psm, diag, sun, view)
        h, w = mask.shape
        expect = np.zeros((h, w), dtype=bool)
        for s in res.shadows.values():
            if s.window is None:
                continue
            ax, ay = s.anchor
            ys, xs = np.nonzero(s.window)
            for y, x in zip(ys, xs):
                expect[h - 1 - (y + ay), x + ax] = True
        np.testing.assert_array_equal(res.shadow_mask, expect)


class TestBetaMap:
    def test_single_shadow_matches_loop_oracle(self):
        mask, cmap, clouds, psm, sun, view, diag = make_scene(seed=3)
        h, w = mask.shape
        res = matching.match_clouds_shadows(clouds, cmap, mask, psm, diag, sun, view)
        clp = np.asarray(rng.random((h, w)), dtype=np.float32)
        ours = refinement.beta_map(res.shadows, res.solutions, clp, diag)
        expected = np.zeros((h, w), dtype=np.float32)
        for sid, s in res.shadows.items():
            if s.window is None:
                continue
            ax, ay = s.anchor
            ys, xs = np.nonzero(s.window)
            pixels = [(int(x + ax), int(y + ay)) for y, x in zip(ys, xs)]
            contrib = od.beta_contribution_oracle(
                pixels, res.solutions[sid].M, clp, diag
            )
            expected = np.maximum(expected, contrib)
        np.testing.assert_allclose(np.flipud(ours), expected, atol=2e-6)


class TestProbabilitySurface:
    def test_histogram_means(self):
        r = np.random.default_rng(2)
        alpha = r.random((50, 60)).astype(np.float32)
        beta = r.random((50, 60)).astype(np.float32)
        shadow = r.random((50, 60)) > 0.7
        el = refinement._probability_map_element(alpha, beta, shadow.astype(np.float32), 8)
        i = np.clip((alpha * 8).astype(int), 0, 7)
        j = np.clip((beta * 8).astype(int), 0, 7)
        for ci in range(8):
            for cj in range(8):
                sel = (i == ci) & (j == cj)
                if sel.sum():
                    assert el.data[cj, ci] == pytest.approx(shadow[sel].mean(), abs=1e-6)

    def test_hole_filling_fills_everything(self):
        alpha = np.full((10, 10), 0.05, dtype=np.float32)
        beta = np.full((10, 10), 0.05, dtype=np.float32)
        shadow = np.ones((10, 10), dtype=np.float32)
        el = refinement._probability_map_element(alpha, beta, shadow, 16)
        assert np.isfinite(el.data).all()
        assert el.data[0, 0] == pytest.approx(1.0)

    def test_surface_sampling_interior(self):
        data = np.outer(np.linspace(0, 1, 16), np.ones(16)).astype(np.float32)
        s = refinement.UniformProbabilitySurface(data)
        # at cell centers the bilinear sample reproduces the cell value
        v = s.sample(np.array([(7 + 0.5) / 16]), np.array([(3 + 0.5) / 16]))
        assert v[0] == pytest.approx(data[3, 7], abs=1e-6)

    def test_improved_mask_composition(self):
        h, w = 12, 14
        surface = refinement.UniformProbabilitySurface(np.ones((8, 8), np.float32))
        alpha = np.full((h, w), 0.5, np.float32)
        beta = np.full((h, w), 0.5, np.float32)
        obj = np.zeros((h, w), bool)
        cloud = np.zeros((h, w), bool)
        cloud[0, 0] = True
        out = refinement.improved_shadow_mask(obj, cloud, alpha, beta, surface, 0.15)
        assert out[3, 3]  # probability 1.0 >= .15
        assert not out[0, 0]  # clouds excluded


class TestAlphaMap:
    def test_logistic_values(self):
        a = refinement.alpha_map(np.array([[0.0, 0.5, 1.0]], dtype=np.float32))
        assert a[0, 0] == pytest.approx(0.0, abs=1e-7)  # F(0) = f(-.5)-f(-.5)
        assert 0.9 < a[0, 1] <= 1.0  # f(0) - f(-.5) ~ .993
        assert a[0, 2] > a[0, 1]


class TestGeometry:
    def test_pixel_world_roundtrip(self):
        shape = (33, 47)
        diag = 12.0
        for i, j in [(0, 0), (46, 32), (5, 17)]:
            p = geometry.pixel_to_world(shape, diag, i, j)
            idx = geometry.world_to_index(shape, diag, p)
            assert (idx[0], idx[1]) == (i, j)

    def test_haversine(self):
        # one degree of latitude ~ 111.2 km
        d = geometry.haversine_distance((0.0, 0.0), (0.0, 1.0))
        assert d == pytest.approx(111.19, abs=0.1)

    def test_ls_point_constrained_altitude(self):
        h, w = 24, 24
        zen = np.full((h, w), np.radians(30.0))
        azi = np.full((h, w), np.radians(90.0))  # sun due east
        grid = geometry.vector_grid(zen, azi)
        p = geometry.ls_point_equal_to(grid, (h, w), 10.0, 1000.0)
        assert p[2] == pytest.approx(1000.0)
        assert p[0] > 500.0  # east of the scene
        assert abs(p[1]) < 50.0

    def test_quadratic_radial_basis(self):
        assert od.beta_contribution_oracle == od.beta_contribution_oracle  # import check
        v = geometry.quadratic_radial_basis(np.array([0.0, 5.0, 40.0, 80.0, 100.0]), 12.0, 80.0, 0.2)
        assert v[0] == 1.0 and v[1] == 1.0
        assert 0.0 < v[2] < 1.0
        assert v[3] == pytest.approx(0.0)
        assert v[4] == 0.0

    def test_ls_point_device_matches_host(self):
        """The full-tile device reduction agrees with the host f64 path to
        f32-direction accuracy (the reference's own precision)."""
        rng = np.random.default_rng(6)
        h, w = 90, 130
        zen = 30.0 + 2.0 * rng.random((h, w))
        azi = 140.0 + 3.0 * rng.random((h, w))
        diag = 25.0
        for z in (1.5e9, 785.0):
            host = geometry.ls_point_equal_to(
                geometry.vector_grid(np.radians(zen), np.radians(azi)), (h, w), diag, z
            )
            dev = geometry.ls_point_equal_to_device(zen, azi, (h, w), diag, z)
            assert dev[2] == pytest.approx(z)
            np.testing.assert_allclose(dev, host, rtol=2e-5)

    def test_ls_point_device_quantized_upload(self, monkeypatch):
        """The u16-quantized angle upload (the full-tile H2D halving)
        perturbs the LS solution by less than f32-direction noise: with
        65535 steps over the raster's own range, direction error is
        ~2e-6 rad, far below the sweep's 25 m height quantization."""
        rng = np.random.default_rng(9)
        h, w = 90, 130
        zen = (30.0 + 2.0 * rng.random((h, w))).astype(np.float32)
        azi = (140.0 + 3.0 * rng.random((h, w))).astype(np.float32)
        monkeypatch.setattr(geometry, "_ANGLE_QUANT_BYTES", 0)
        # the gate really engages: the pushed raster is not bit-equal f32
        pushed = np.asarray(geometry._push_angles(zen, True))
        assert not np.array_equal(pushed, zen)
        np.testing.assert_allclose(pushed, zen, atol=3.1e-5 * (zen.max() - zen.min()))
        for z in (1.5e9, 785.0):
            exact = geometry.ls_point_equal_to_device(
                zen, azi, (h, w), 25.0, z, quantize=False
            )
            quant = geometry.ls_point_equal_to_device(zen, azi, (h, w), 25.0, z)
            np.testing.assert_allclose(quant, exact, rtol=1e-4)


class TestNoCloudScene:
    def test_detect_stages_handle_empty_clouds(self):
        """A fully clear scene: no clouds -> no matches -> empty shadows."""
        from satellite_approximation_tpu.models.detection import (
            cloud_mask as cm,
            shadow_mask as sm,
        )
        from satellite_approximation_tpu.ops.stats import trimmed_average

        h, w = 64, 80
        clp = np.zeros((h, w), np.float32)
        cld = np.zeros((h, w), np.float32)
        scl = np.full((h, w), 4, np.uint8)  # vegetation
        g = cm.generate_cloud_mask_ignore_low_probability(clp, cld, scl)
        assert not g.cloud_mask.any()
        cmap, clouds = cm.partition_cloud_mask(g.cloud_mask_no_processing, 10.0, 3)
        assert clouds == []
        assert (cmap == -1).all()

        sun = np.array([1e8, 1e8, 1.5e9])
        view = np.array([0.0, 0.0, 785.0])
        nir = np.full((h, w), 0.4, np.float32)
        psm = sm.generate_potential_shadow_mask(nir, g.cloud_mask_no_processing, scl)
        res = matching.match_clouds_shadows(
            clouds, cmap, g.cloud_mask_no_processing, psm.mask, 10.0, sun, view
        )
        assert res.solutions == {} and res.shadows == {}
        assert not res.shadow_mask.any()
        assert np.isnan(res.trimmed_mean_height)  # matches trimmedAverage on empty

        alpha = refinement.alpha_map(psm.difference_of_pitfill_nir)
        beta = refinement.beta_map(res.shadows, res.solutions, clp, 10.0)
        assert not beta.any()
        surface = refinement.probability_map(res.shadow_mask, alpha, beta)
        final = refinement.improved_shadow_mask(
            res.shadow_mask, g.cloud_mask, alpha, beta, surface, 0.15
        )
        assert final.shape == (h, w)


class TestMatchingBackendEquivalence:
    """The native C++ scan and the XLA bucket sweep must produce identical
    matches (same predicate, same f32 rounding — satnative.cpp builds with
    -ffp-contract=off so the affine back-projection truncates identically)."""

    def test_native_equals_device(self):
        from satellite_approximation_tpu import native

        if not native.available():
            import pytest as _pytest

            _pytest.skip("native library unavailable")
        mask, cmap, clouds, psm, sun, view, diag = make_scene()
        # saturate the potential-shadow mask so every cloud ACCEPTS (the
        # default scene rejects all clouds, which would only exercise the
        # reject path); hit windows, bounds, and areas then all compare
        psm = np.ones_like(psm)
        res_n = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, diag, sun, view, use_native=True
        )
        res_d = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, diag, sun, view, use_native=False
        )
        assert any(s.similarity > 0 for s in res_n.solutions.values())
        np.testing.assert_array_equal(res_n.shadow_mask, res_d.shadow_mask)
        assert res_n.solutions.keys() == res_d.solutions.keys()
        for cid in res_n.solutions:
            a, b = res_n.solutions[cid], res_d.solutions[cid]
            assert a.height == b.height, cid
            assert a.similarity == b.similarity, cid
            np.testing.assert_allclose(a.M, b.M)
            sa, sb = res_n.shadows[cid], res_d.shadows[cid]
            assert sa.bounds == sb.bounds
            assert sa.area == sb.area
            assert sa.anchor == sb.anchor
        np.testing.assert_equal(res_n.trimmed_mean_height, res_d.trimmed_mean_height)


class TestDynamicPercentile:
    def test_bisection_matches_sorted_selection(self):
        """The f32 bit-space bisection must select exactly the value the
        sort-based formulation picks, for many ranks and masks."""
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.detection.shadow_mask import (
            _dynamic_percentile,
        )

        rng = np.random.default_rng(21)
        vals = rng.random((137, 91)).astype(np.float32)
        vals[vals > 0.97] = 0.25  # duplicates
        mask = rng.random((137, 91)) < 0.6
        count = int(mask.sum())
        flat_sorted = np.sort(vals[mask])
        for percent in (0.001, 0.2, 0.5, 0.7, 0.99, 1.0):
            x = np.int32(np.float32(percent) * np.float32(count))
            expect = (
                np.float32(0.0) if x < 1
                else np.float32(1.0) if x > count
                else flat_sorted[x - 1]
            )
            got = float(
                _dynamic_percentile(
                    jnp.asarray(vals), jnp.asarray(mask), jnp.float32(percent)
                )
            )
            assert got == expect, (percent, got, expect)

    def test_empty_mask(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.models.detection.shadow_mask import (
            _dynamic_percentile,
        )

        vals = np.ones((8, 8), np.float32)
        got = float(_dynamic_percentile(jnp.asarray(vals), jnp.zeros((8, 8), bool), jnp.float32(0.5)))
        assert got == 0.0

    def test_ls_point_chunked_matches_device(self):
        rng = np.random.default_rng(8)
        h, w = 97, 141
        zen = 30.0 + 2.0 * rng.random((h, w))
        azi = 140.0 + 3.0 * rng.random((h, w))
        for z in (1.5e9, 785.0):
            dev = geometry.ls_point_equal_to_device(zen, azi, (h, w), 25.0, z)
            chk = geometry.ls_point_equal_to_chunked(
                zen, azi, (h, w), 25.0, z, rows_per_chunk=17
            )
            # agreement is at f32-direction level (numpy vs XLA trig differ
            # by ulps; accumulation orders differ) — same contract as
            # device-vs-host
            np.testing.assert_allclose(chk, dev, rtol=2e-5)

class TestSeparableSweep:
    """The gather-free shift-decomposed sweep must be bit-equal to the
    gather sweep whenever _sep_metadata vouches for the chunk, including
    scenes whose shift spans cover several integers and whose source
    anchors are negative (shadow cast toward lower indices)."""

    @staticmethod
    def _big_scene(sun, seed=11, h=640, w=768, diag=9.0):
        r = np.random.default_rng(seed)
        mask = np.zeros((h, w), dtype=bool)
        mask[200:420, 250:480] = True  # big cloud: spans reach ~4 px at 12 km
        mask[60:70, 600:640] = True
        cmap, clouds = cm.partition_cloud_mask(mask, diag, 3)
        psm = (r.random((h, w)) > 0.5) & ~mask
        view = np.array([0.05, 0.1, 785.0])
        return mask, cmap, clouds, psm, view

    @pytest.mark.parametrize(
        "sun",
        [np.array([2.0e8, 1.0e8, 1.5e9]), np.array([-2.0e8, -1.2e8, 1.5e9])],
        ids=["cast_up_right", "cast_down_left"],
    )
    def test_sep_equals_gather(self, sun, monkeypatch):
        mask, cmap, clouds, psm, view = self._big_scene(sun)
        config = MatchingConfig(height_step_km=0.35, backend="jax")

        routes = {"sep": 0, "gather": 0}
        orig_sep = matching._bucket_sweep_sep
        orig_gat = matching._bucket_sweep

        def count_sep(*a, **k):
            routes["sep"] += 1
            return orig_sep(*a, **k)

        def count_gat(*a, **k):
            routes["gather"] += 1
            return orig_gat(*a, **k)

        monkeypatch.setattr(matching, "_bucket_sweep_sep", count_sep)
        monkeypatch.setattr(matching, "_bucket_sweep", count_gat)
        res_sep = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, 9.0, sun, view, config
        )
        assert routes["sep"] > 0 and routes["gather"] == 0

        # force the gather route by vetoing separability
        orig_meta = matching._sep_metadata

        def veto(*a, **k):
            ok, sx, sy, rx, ry = orig_meta(*a, **k)
            return np.zeros_like(ok), sx, sy, rx, ry

        monkeypatch.setattr(matching, "_sep_metadata", veto)
        res_gat = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, 9.0, sun, view, config
        )
        assert routes["gather"] > 0

        np.testing.assert_array_equal(res_sep.shadow_mask, res_gat.shadow_mask)
        assert res_sep.solutions.keys() == res_gat.solutions.keys()
        for cid in res_sep.solutions:
            a, b = res_sep.solutions[cid], res_gat.solutions[cid]
            assert a.height == b.height, cid
            assert a.similarity == b.similarity, cid
        np.testing.assert_equal(
            res_sep.trimmed_mean_height, res_gat.trimmed_mean_height
        )

    def test_spans_exercised(self):
        """The big-cloud scene must actually cover multi-integer shifts —
        otherwise test_sep_equals_gather proves nothing about the shift
        enumeration."""
        sun = np.array([2.0e8, 1.0e8, 1.5e9])
        mask, cmap, clouds, psm, view = self._big_scene(sun)
        heights = matching.height_sweep(MatchingConfig(height_step_km=0.35))
        h, w = mask.shape
        a2, delta, (mnx, mxx, mny, mxy), _ = matching._cast_transforms(
            clouds, heights, (h, w), 9.0, sun, view
        )
        wb = int((mxx - mnx + 1).max())
        hb = int((mxy - mny + 1).max())
        ok, sx, sy, rx, ry = matching._sep_metadata(
            np.swapaxes(a2, 0, 1).astype(np.float32),
            np.swapaxes(delta, 0, 1).astype(np.float32),
            mnx.T, mny.T, wb, hb, w, h,
        )
        assert ok.all()
        assert rx >= 4 and ry >= 4  # guard band alone would give 2

    def test_metadata_rejects_shear(self):
        """Cross terms big enough to survive f32 rounding must fail the
        pinch check (the router then takes the gather kernel)."""
        nc, nh, wb, hb = 1, 3, 64, 64
        a2 = np.tile(np.eye(2, dtype=np.float32), (nh, nc, 1, 1))
        a2[..., 0, 1] = 0.01  # 0.64 px of cross-row drift over the window
        dl = np.full((nh, nc, 2), 5.0, np.float32)
        mnx = np.full((nh, nc), 100, np.int64)
        mny = np.full((nh, nc), 200, np.int64)
        ok, *_ = matching._sep_metadata(a2, dl, mnx, mny, wb, hb, 512, 512)
        assert not ok.any()

    def test_oversized_windows_route_to_native(self, monkeypatch):
        """Windows above the bucket cap must not be truncated: they scan on
        the native backend (exact bboxes) and merge with the device results."""
        from satellite_approximation_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        sun = np.array([2.0e8, 1.0e8, 1.5e9])
        mask, cmap, clouds, psm, view = self._big_scene(sun)
        psm = np.ones_like(psm) & ~mask
        config = MatchingConfig(height_step_km=0.5)
        res_native = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, 9.0, sun, view, config, use_native=True
        )
        # shrink the bucket cap so the 230-px cloud window counts as oversized
        monkeypatch.setattr(matching, "_BUCKETS", (8, 16, 32, 64, 128))
        res_mixed = matching.match_clouds_shadows(
            clouds, cmap, mask, psm, 9.0, sun, view, config, use_native=False
        )
        assert any(s.similarity > 0 for s in res_native.solutions.values())
        np.testing.assert_array_equal(res_native.shadow_mask, res_mixed.shadow_mask)
        for cid in res_native.solutions:
            a, b = res_native.solutions[cid], res_mixed.solutions[cid]
            assert a.height == b.height and a.similarity == b.similarity, cid
