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
