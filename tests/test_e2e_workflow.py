"""End-to-end multi-date workflow (BASELINE config #5 shape): detect clouds
and shadows over a time series, pick the best replacement date, and
Poisson-fill the gaps — plus CLI entry points."""

from pathlib import Path

import numpy as np
import pytest

from satellite_approximation_tpu.models.detection.pipeline import (
    detect_in_folder,
    get_diagonal_distance,
)
from satellite_approximation_tpu.models.closest import find_good_close_image
from satellite_approximation_tpu.models.poisson import blend_images_poisson
from satellite_approximation_tpu.utils.db import DataBase
from satellite_approximation_tpu.utils.geotiff import GeoTIFF, write_geotiff
from satellite_approximation_tpu.utils.loader import FolderPrefetcher

REF_SCENE = Path("/root/reference/test_data/2019-05-22")
R0, R1, C0, C1 = 700, 1000, 350, 700


def crop_diagonal() -> float:
    t = GeoTIFF.open(REF_SCENE / "B08.tif")
    west = t.west() + C0 * t.east_west_step()
    east = t.west() + C1 * t.east_west_step()
    north = t.north() + R0 * t.north_south_step()
    south = t.north() + R1 * t.north_south_step()
    return get_diagonal_distance(west, south, east, north)


@pytest.fixture(scope="module")
def time_series(tmp_path_factory):
    """Two synthetic dates built from the real crop: 05-22 is the real
    (cloudy) scene; 05-30 is a 'clear' variant with the cloud evidence
    wiped, so it becomes the preferred replacement date."""
    base = tmp_path_factory.mktemp("series")
    names = [
        "B08", "CLP", "CLD", "SCL",
        "sunZenithAngles", "sunAzimuthAngles", "viewZenithMean", "viewAzimuthMean",
    ]
    data = {}
    for n in names:
        data[n] = GeoTIFF.open(REF_SCENE / f"{n}.tif").read()[R0:R1, C0:C1]

    cloudy = base / "2019-05-22"
    cloudy.mkdir()
    for n in names:
        write_geotiff(data[n], cloudy / f"{n}.tif", template_path=REF_SCENE / "B08.tif")
    write_geotiff(data["B08"], cloudy / "B04.tif", template_path=REF_SCENE / "B08.tif")

    clear = base / "2019-05-30"
    clear.mkdir()
    for n in names:
        v = data[n].copy()
        if n == "CLP" or n == "CLD":
            v[:] = 0
        if n == "SCL":
            v[(v == 8) | (v == 9) | (v == 3)] = 4  # clouds/shadows -> vegetation
        write_geotiff(v, clear / f"{n}.tif", template_path=REF_SCENE / "B08.tif")
    write_geotiff(data["B08"], clear / "B04.tif", template_path=REF_SCENE / "B08.tif")
    return base


class TestMultiDateWorkflow:
    def test_detect_fill_roundtrip(self, time_series):
        diag = crop_diagonal()
        results = detect_in_folder(time_series, diag, use_cache=True)
        assert len(results) == 2
        dates = sorted(results, key=str)
        cloudy, clear = results[dates[0]], results[dates[1]]
        assert cloudy.percent_invalid > clear.percent_invalid
        assert clear.percent_clouds < 0.01

        # the clear date should be picked as the replacement
        db = DataBase(time_series)
        best = find_good_close_image("2019-05-22", 0.3, db)
        db.close()
        assert best == "2019-05-30"

        # Poisson-fill the cloudy date's NIR from the clear date
        cloudy_dir = time_series / "2019-05-22"
        clear_dir = time_series / best
        mask = GeoTIFF.open(cloudy_dir / "cloud_mask.tif").read().astype(bool)
        mask |= GeoTIFF.open(cloudy_dir / "shadow_mask.tif").read().astype(bool)
        inputs = GeoTIFF.open(cloudy_dir / "B08.tif").read().astype(np.float64)[None]
        repl = GeoTIFF.open(clear_dir / "B08.tif").read().astype(np.float64)[None]
        out = blend_images_poisson(inputs, repl, invalid_mask=mask)
        assert np.isfinite(out).all()
        np.testing.assert_array_equal(out[0][~mask], inputs[0][~mask])

        # caching: a second run short-circuits every date
        results2 = detect_in_folder(time_series, diag, use_cache=True)
        assert results2 == {}

    def test_prefetcher_yields_all_dates(self, time_series):
        pf = FolderPrefetcher(time_series, names=("B08", "SCL"), prefetch=2)
        seen = []
        for folder, rasters in pf:
            seen.append(folder.name)
            assert rasters["B08"].shape == (R1 - R0, C1 - C0)
        assert seen == ["2019-05-22", "2019-05-30"]

    def test_prefetched_inputs_match_disk_reads(self, time_series, tmp_path):
        """detect() fed pre-decoded rasters writes bit-identical masks to the
        disk-read path (the contract detect_in_folder's prefetch relies on)."""
        import shutil

        from satellite_approximation_tpu.models.detection.pipeline import CloudParams, detect
        from satellite_approximation_tpu.utils.loader import load_detection_inputs

        diag = crop_diagonal()
        src = time_series / "2019-05-22"
        a_dir, b_dir = tmp_path / "a", tmp_path / "b"
        for d in (a_dir, b_dir):
            d.mkdir()
            for f in src.glob("*.tif"):
                if "mask" not in f.name and "shadow" not in f.name:
                    shutil.copy(f, d / f.name)

        detect(CloudParams.from_root(a_dir), diag, use_cache=False)
        detect(
            CloudParams.from_root(b_dir), diag, use_cache=False,
            inputs=load_detection_inputs(b_dir),
        )
        for name in ("cloud_mask", "potential_shadows", "object_based_shadows", "shadow_mask"):
            ga = GeoTIFF.open(a_dir / f"{name}.tif").read()
            gb = GeoTIFF.open(b_dir / f"{name}.tif").read()
            np.testing.assert_array_equal(ga, gb, err_msg=name)


class TestCLI:
    def test_laplace_main(self, tmp_path):
        from PIL import Image
        from satellite_approximation_tpu.cli.laplace_main import main

        rng = np.random.default_rng(0)
        base = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
        marker = np.zeros((32, 40, 3), np.uint8)
        marker[10:16, 12:20, 0] = 255
        Image.fromarray(base).save(tmp_path / "base.png")
        Image.fromarray(marker).save(tmp_path / "marker.png")
        assert main([str(tmp_path / "base.png"), str(tmp_path / "marker.png"), str(tmp_path / "out.png")]) == 0
        out = np.asarray(Image.open(tmp_path / "out.png"))
        assert out.shape == base.shape
        changed = np.abs(out.astype(int) - base.astype(int)).sum(axis=-1) > 0
        assert changed[10:16, 12:20].mean() > 0.5
        assert not changed[:5, :5].any()

    def test_poisson_main(self, tmp_path):
        from PIL import Image, TiffImagePlugin
        from satellite_approximation_tpu.cli.poisson_main import main
        from satellite_approximation_tpu.utils.geotiff import write_geotiff, GeoTIFF

        rng = np.random.default_rng(1)
        h, w = 28, 36
        bands = [(rng.random((h, w)) * 1000).astype(np.float32) for _ in range(5)]
        cloud = np.zeros((h, w), np.float32)
        cloud[10:18, 10:20] = 1
        # multi-page tif: 5 bands + cloud band
        pages = [Image.fromarray(b) for b in bands + [cloud]]
        pages[0].save(tmp_path / "input.tif", save_all=True, append_images=pages[1:])
        repl = [Image.fromarray((rng.random((h, w)) * 1000).astype(np.float32)) for _ in range(5)]
        repl[0].save(tmp_path / "repl.tif", save_all=True, append_images=repl[1:])

        assert main([str(tmp_path / "input.tif"), str(tmp_path / "repl.tif")]) == 0
        # One 5-band file, like the reference executable
        # (poisson-main.cpp:66-71 writes a single multi-band GeoTIFF).
        out_dir = tmp_path / "poisson_simple_replace"
        outs = sorted(out_dir.glob("*.tif"))
        assert len(outs) == 1
        t = GeoTIFF.open(outs[0])
        assert t.num_bands == 5
        assert t.read_all().shape == (5, h, w)

    def test_cloud_detection_main(self, tmp_path):
        from satellite_approximation_tpu.cli.cloud_detection_main import main
        from satellite_approximation_tpu.utils.geotiff import GeoTIFF, write_geotiff

        folder = tmp_path / "2019-05-22"
        folder.mkdir()
        names = [
            "B08", "CLP", "CLD", "SCL",
            "sunZenithAngles", "sunAzimuthAngles", "viewZenithMean", "viewAzimuthMean",
        ]
        for n in names:
            data = GeoTIFF.open(REF_SCENE / f"{n}.tif").read()[R0:R1, C0:C1]
            write_geotiff(data, folder / f"{n}.tif", template_path=REF_SCENE / "B08.tif")
        assert main([str(folder)]) == 0
        assert (folder / "cloud_mask.tif").exists()
        assert (folder / "shadow_mask.tif").exists()
