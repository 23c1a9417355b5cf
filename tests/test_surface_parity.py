"""Coverage for the remaining reference API surface: Imageio-parity raster
IO, vector-grid extras, misc image ops, folder-batch fill, connected
components public API, compute info."""

import numpy as np
import pytest

from satellite_approximation_tpu.ops import geometry, image
from satellite_approximation_tpu.utils import rasterio_ as rio
from satellite_approximation_tpu.utils.compute import init_main_context, platform_and_device_info


class TestRasterIO:
    def test_single_channel_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        for dtype in (np.float32, np.uint8, np.uint16, np.uint32):
            data = (rng.random((12, 17)) * 100).astype(dtype)
            p = tmp_path / f"x_{dtype.__name__}.tif"
            rio.write_single_channel(p, data)
            reader = {
                np.float32: rio.read_single_channel_float,
                np.uint8: rio.read_single_channel_uint8,
                np.uint16: rio.read_single_channel_uint16,
                np.uint32: rio.read_single_channel_uint32,
            }[dtype]
            np.testing.assert_array_equal(reader(p), data)

    def test_rejects_non_tif(self, tmp_path):
        with pytest.raises(Exception):
            rio.read_single_channel_float(tmp_path / "x.png")

    def test_rgba_pack_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        packed = rng.integers(0, 2**32, size=(9, 11), dtype=np.uint32)
        p = tmp_path / "rgba.png"
        rio.write_rgba(p, packed)
        back = rio.read_rgba(p)
        np.testing.assert_array_equal(back, packed)

    def test_decompose(self):
        packed = np.array([[0xFF336699]], dtype=np.uint32)
        f = rio.decompose_rgba(packed)
        np.testing.assert_allclose(
            f[0, 0], [0x99 / 255, 0x66 / 255, 0x33 / 255, 0xFF / 255], atol=1e-7
        )
        u = rio.decompose_rgba_256(packed)
        np.testing.assert_array_equal(u[0, 0], [0x99, 0x66, 0x33, 0xFF])


class TestVectorGridExtras:
    def grid(self, h=16, w=16, zen=30.0, azi=90.0):
        return geometry.vector_grid(
            np.full((h, w), np.radians(zen)), np.full((h, w), np.radians(azi))
        )

    def test_ls_point_unconstrained(self):
        g = self.grid()
        p = geometry.ls_point(g, (16, 16), 10.0)
        assert np.isfinite(p).all()

    def test_bounded_variants(self):
        g = self.grid()
        p_hi = geometry.ls_point_greater_than(g, (16, 16), 10.0, 500.0)
        assert p_hi[2] >= 500.0 - 1e-6 or np.isfinite(p_hi).all()
        p_lo = geometry.ls_point_less_than(g, (16, 16), 10.0, 500.0)
        assert np.isfinite(p_lo).all()

    def test_average_dot_product_peaks_along_rays(self):
        g = self.grid()
        p_eq = geometry.ls_point_equal_to(g, (16, 16), 10.0, 1000.0)
        score = geometry.average_dot_product(g, (16, 16), 10.0, p_eq)
        assert score > 0.99  # parallel rays: the LS point is on-axis

    def test_average_direction(self):
        g = self.grid()
        d = geometry.average_direction(g)
        np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-12)
        assert d[2] > 0.8  # mostly up for zenith 30

    def test_sum_of_square_distance_minimized_at_ls_point(self):
        rng = np.random.default_rng(3)
        zen = np.radians(30 + rng.random((12, 12)) * 2)
        azi = np.radians(85 + rng.random((12, 12)) * 10)
        g = geometry.vector_grid(zen, azi)
        p = geometry.ls_point(g, (12, 12), 10.0)
        s0 = geometry.sum_of_square_distance(g, (12, 12), 10.0, p)
        s1 = geometry.sum_of_square_distance(g, (12, 12), 10.0, p + np.array([5.0, 0, 0]))
        assert s0 <= s1


class TestImageOps:
    def test_obscure(self):
        import jax.numpy as jnp

        img = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
        mask = jnp.asarray(np.array([[True, False, False], [False, True, False]]))
        out = np.asarray(image.obscure(img, mask, -1.0))
        assert out[0, 0] == -1.0 and out[1, 1] == -1.0 and out[0, 1] == 1.0

    def test_partition_selects_true(self):
        img = np.arange(9).reshape(3, 3)
        mask = img % 2 == 0
        np.testing.assert_array_equal(
            image.partition_unobscured_obscured(img, mask), [0, 2, 4, 6, 8]
        )

    def test_bottom_left_accessor(self):
        a = np.arange(6).reshape(2, 3)
        assert image.at(a, 0, 0) == a[1, 0]
        assert image.at(a, 2, 1) == a[0, 2]


class TestFolderFill:
    def test_batch_fill_with_db(self, tmp_path):
        from satellite_approximation_tpu.models.detection.pipeline import Status
        from satellite_approximation_tpu.models.laplace import fill_missing_data_folder
        from satellite_approximation_tpu.utils.db import DataBase, ApproxMethod
        from satellite_approximation_tpu.utils.geotiff import write_geotiff, GeoTIFF

        folder = tmp_path / "2019-05-22"
        folder.mkdir()
        rng = np.random.default_rng(0)
        h, w = 24, 28
        mask = np.zeros((h, w), np.uint8)
        mask[8:14, 10:16] = 1
        write_geotiff(mask, folder / "cloud_mask.tif")
        write_geotiff(np.zeros((h, w), np.uint8), folder / "shadow_mask.tif")
        band = (rng.random((h, w)) * 1000).astype(np.float32)
        write_geotiff(band, folder / "B04.tif")

        db = DataBase(tmp_path)
        db.write_detection_result(
            "2019-05-22",
            Status(percent_invalid=0.05, clouds_computed=True, shadows_computed=True),
        )
        db.close()

        fill_missing_data_folder(tmp_path, ["B04"], use_cache=True)

        db = DataBase(tmp_path)
        status = db.get_approx_status("2019-05-22", ApproxMethod.Laplace)
        assert "B04" in status
        out = folder / "approximated_data" / f"B04_{status['B04']}.tif"
        assert out.exists()
        filled = GeoTIFF.open(out).read()
        assert not np.array_equal(filled[mask.astype(bool)], band[mask.astype(bool)])
        np.testing.assert_allclose(
            filled[~mask.astype(bool)], band[~mask.astype(bool)], rtol=1e-6
        )
        db.close()

    def test_connected_components_api(self):
        from satellite_approximation_tpu.models.laplace import find_connected_components

        mask = np.zeros((8, 8), bool)
        mask[1:3, 1:3] = True
        mask[5:7, 5:7] = True
        id_map, region_map = find_connected_components(mask)
        assert sorted(region_map.keys()) == [0, 1]
        assert len(region_map[0]) == 4 and len(region_map[1]) == 4
        assert id_map[1, 1] in (0, 1)


class TestCompute:
    def test_info(self):
        init_main_context()
        info = platform_and_device_info()
        assert "backend" in info and "device 0" in info
