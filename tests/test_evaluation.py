"""ShadowMaskEvaluation parity: confusion-matrix accuracy formulas and the
casted-image evaluation bounds (reference ShadowMaskEvaluation.cpp), plus
the spectral indices module."""

import numpy as np
import pytest

from satellite_approximation_tpu.models.detection import evaluation as ev
from satellite_approximation_tpu import indices as idx
from satellite_approximation_tpu.utils.geotiff import GeoTIFF, write_geotiff


class TestEvaluate:
    def setup_method(self):
        # 4x4 scene, bottom-origin bounds covering everything
        self.shadow = np.array(
            [
                [1, 1, 0, 0],
                [0, 0, 0, 0],
                [1, 0, 0, 0],
                [0, 0, 0, 1],
            ],
            dtype=bool,
        )
        self.baseline = np.array(
            [
                [1, 0, 0, 0],
                [0, 1, 0, 0],
                [1, 0, 0, 0],
                [0, 0, 0, 0],
            ],
            dtype=bool,
        )
        self.cloud = np.zeros((4, 4), dtype=bool)
        self.cloud[3, 0] = True

    def test_class_image(self):
        res = ev.evaluate(self.shadow, self.cloud, self.baseline, (0, 0, 3, 3))
        c = res.pixel_classes
        assert c[0, 0] == ev.TRUE_POSITIVE_CLASS
        assert c[0, 1] == ev.FALSE_POSITIVE_CLASS
        assert c[1, 1] == ev.FALSE_NEGATIVE_CLASS
        assert c[0, 2] == ev.TRUE_NEGATIVE_CLASS
        assert c[3, 0] == ev.CLOUDS_CLASS

    def test_error_rates(self):
        # full-window sub-counting uses the reference's half-open loop limits
        res = ev.evaluate(self.shadow, self.cloud, self.baseline, (0, 0, 3, 3))
        assert 0.0 <= res.error_total <= 1.0
        assert res.error_total == pytest.approx(
            res.positive_error_total + res.negative_error_total
        )
        assert res.producers_accuracy > 0
        assert res.users_accuracy > 0

    def test_rgba_rendering(self):
        res = ev.evaluate(self.shadow, self.cloud, self.baseline, (0, 0, 3, 3))
        rgba = ev.generate_rgba(res.pixel_classes)
        assert rgba.dtype == np.uint32
        assert rgba[3, 0] == ev.CLASS_COLOURS[ev.CLOUDS_CLASS]

    def test_casted_bounds_shift_with_sun(self):
        shape = (64, 64)
        sun_east = np.array([2.0e8, 0.0, 1.5e9])
        view = np.array([0.0, 0.0, 785.0])
        b0 = ev.casted_image_bounds(shape, 10.0, sun_east, view, 2.0)
        # with the sun to the east, shadows (and the evaluable region)
        # shift west: the x upper bound pulls in
        full = (0, 0, 63, 63)
        assert b0[0] == 0
        assert b0[2] <= full[2]
        assert 0 <= b0[1] <= b0[3] <= 63


class TestIndices:
    def test_required_and_missing(self):
        assert idx.required_files(idx.Indices.NDVI) == ["B08", "B04"]
        assert idx.missing_files(["B08"], idx.Indices.NDVI)
        assert not idx.missing_files(["B08", "B04"], idx.Indices.NDVI)
        assert idx.from_str("NDVI") == idx.Indices.NDVI
        assert idx.from_str("nope") is None

    def test_compute_index_and_cache(self, tmp_path):
        rng = np.random.default_rng(0)
        b08 = (rng.random((10, 12)) * 10000).astype(np.float32)
        b04 = (rng.random((10, 12)) * 10000).astype(np.float32)
        b04[0, 0] = 0.0
        b08[0, 0] = 0.0  # 0/0 -> 0 semantics
        write_geotiff(b08, tmp_path / "B08.tif")
        write_geotiff(b04, tmp_path / "B04.tif")
        ndvi = idx.compute_index(tmp_path, tmp_path / "B08.tif", idx.Indices.NDVI, use_cache=False)
        expected = (b08 - b04) / (b08 + b04)
        expected[0, 0] = 0.0
        np.testing.assert_allclose(ndvi, expected, rtol=1e-6)
        assert (tmp_path / "NDVI.tif").exists()
        # cached read returns the stored raster
        again = idx.compute_index(tmp_path, tmp_path / "B08.tif", idx.Indices.NDVI, use_cache=True)
        np.testing.assert_allclose(again, expected, atol=1e-6)

    def test_swi(self, tmp_path):
        rng = np.random.default_rng(1)
        for name in ("B03", "B08", "B11"):
            write_geotiff((rng.random((6, 7)) * 1000 + 1).astype(np.float32), tmp_path / f"{name}.tif")
        swi = idx.compute_index(tmp_path, tmp_path / "B08.tif", idx.Indices.SWI, use_cache=False)
        assert np.isfinite(swi).all()


class TestGoldenColours:
    """Value-asserting goldens against the reference's colour constants
    (SceneClassificationLayer.h:31-43, ShadowMaskEvaluation.h:5-10)."""

    def test_scl_rgba_all_classes(self):
        from satellite_approximation_tpu.ops.masks import scl_rgba

        scl = np.arange(13, dtype=np.uint16).reshape(1, 13)  # 0..11 + unknown 12
        got = scl_rgba(scl)[0]
        expected = [
            0xFF000000,  # NO_DATA             (SceneClassificationLayer.h:31)
            0xFF333333,  # SATURATED_DEFECTIVE (:32)
            0xFF00FFFF,  # DARK_AREA_PIXELS    (:33)
            0xFFFF007F,  # CLOUD_SHADOWS       (:34)
            0xFF00FF00,  # VEGETATION          (:35)
            0xFF003300,  # BARE_SOIL           (:36)
            0xFFFF0000,  # WATER               (:37)
            0xFF000033,  # CLOUD_LOW           (:38)
            0xFF00007F,  # CLOUD_MEDIUM        (:39)
            0xFF0000FF,  # CLOUD_HIGH          (:40)
            0xFF00FFFF,  # CLOUD_CIRRUS        (:41)
            0xFFFFFF00,  # SNOW_ICE            (:42)
            0xFF000000,  # default -> NO_DATA  (GenerateRGBA default branch)
        ]
        assert got.dtype == np.uint32
        np.testing.assert_array_equal(got, np.array(expected, np.uint32))

    def test_evaluation_rgba_all_classes(self):
        classes = np.arange(7, dtype=np.uint32).reshape(1, 7)  # 0..5 + unknown 6
        got = ev.generate_rgba(classes)[0]
        expected = [
            0xFF000000,  # UNKNOWN         (ShadowMaskEvaluation.h:5)
            0xFF00FF00,  # TRUE_NEGATIVE   (:6)
            0xFFFF0000,  # TRUE_POSITIVE   (:7)
            0xFF0000FF,  # FALSE_NEGATIVE  (:8)
            0xFFFF00FF,  # FALSE_POSITIVE  (:9)
            0xFFFFFFFF,  # CLOUDS          (:10)
            0xFF000000,  # out-of-range -> UNKNOWN
        ]
        np.testing.assert_array_equal(got, np.array(expected, np.uint32))


class TestEvaluateGolden:
    """Hand-built confusion case with analytically known accuracies
    (ShadowMaskEvaluation.cpp:9-69)."""

    def _case(self):
        h = w = 8
        cloud = np.zeros((h, w), bool)
        cloud[0, 0:4] = True  # 4 cloud pixels
        pred = np.zeros((h, w), bool)
        base = np.zeros((h, w), bool)
        # 6 TP
        pred[1, 0:6] = True
        base[1, 0:6] = True
        # 8 FP (pred only)
        pred[2, 0:8] = True
        # 6 FN (base only)
        base[3, 0:6] = True
        # also mark a cloud pixel as shadow in both: must be excluded
        pred[0, 0] = True
        base[0, 0] = True
        return pred, cloud, base

    def test_metrics(self):
        pred, cloud, base = self._case()
        res = ev.evaluate(pred, cloud, base, (0, 0, 7, 7))
        # The reference counts with half-open bounds CLAMPED to dim-1
        # (ImageOperations.cpp:188-201: i < min(cols-1, x1)) while n_total
        # uses the inclusive bounds size (types.cpp:3). We mirror both.
        # Counted region: y-from-bottom 0..6 (drops top row 0, the cloud
        # row), x 0..6 (drops col 7, one FP pixel):
        n_total = 64.0
        n_fp, n_fn = 7.0, 6.0  # FP row loses col 7
        n_rel = 19.0  # 6 TP + 7 FP + 6 FN
        assert res.positive_error_total == pytest.approx(n_fp / n_total)
        assert res.negative_error_total == pytest.approx(n_fn / n_total)
        assert res.error_total == pytest.approx((n_fp + n_fn) / n_total)
        assert res.positive_error_relative == pytest.approx(n_fp / n_rel)
        assert res.negative_error_relative == pytest.approx(n_fn / n_rel)
        assert res.error_relative == pytest.approx((n_fp + n_fn) / n_rel)
        assert res.producers_accuracy == pytest.approx(0.5)  # (6/19)/(12/19)
        assert res.users_accuracy == pytest.approx(6 / 13)  # (6/19)/(13/19)

    def test_class_image(self):
        pred, cloud, base = self._case()
        res = ev.evaluate(pred, cloud, base, (0, 0, 7, 7))
        cl = res.pixel_classes
        assert (cl[1, 0:6] == ev.TRUE_POSITIVE_CLASS).all()
        assert (cl[2, 0:8] == ev.FALSE_POSITIVE_CLASS).all()
        assert (cl[3, 0:6] == ev.FALSE_NEGATIVE_CLASS).all()
        assert (cl[0, 0:4] == ev.CLOUDS_CLASS).all()
        assert (cl[5, :] == ev.TRUE_NEGATIVE_CLASS).all()


class TestHighlightAreaReplaced:
    def test_paints_valid_pixels_only(self):
        from satellite_approximation_tpu.models.poisson import (
            highlight_area_replaced,
            valid_pixel_mask,
        )

        rng = np.random.default_rng(0)
        inputs = rng.random((3, 10, 12))
        repl = rng.random((3, 4, 5))
        repl[:, 0, 0] = 1.0  # white sentinel: not replaced (utils.h:101-105)
        out = highlight_area_replaced(inputs, repl, 2, 3, (0.9, 0.1, 0.2))
        mask = valid_pixel_mask(repl)
        assert not mask[0, 0]
        window = out[:, 2:6, 3:8]
        for c, col in enumerate((0.9, 0.1, 0.2)):
            np.testing.assert_array_equal(window[c][mask], col)
            np.testing.assert_array_equal(
                window[c][~mask], inputs[c, 2:6, 3:8][~mask]
            )
        untouched = out.copy()
        untouched[:, 2:6, 3:8] = inputs[:, 2:6, 3:8]
        np.testing.assert_array_equal(untouched, inputs)
