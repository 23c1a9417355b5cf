"""Tests for utils: GeoTIFF IO, status DB, dates, filesystem, imageio, perf."""

import numpy as np
import pytest

from satellite_approximation_tpu.utils.dates import Date
from satellite_approximation_tpu.utils.db import (
    ApproxMethod,
    DataBase,
    DayInfo,
)
from satellite_approximation_tpu.utils.filesystem import (
    DirectoryContents,
    find_directory_contents,
    multispectral_folders,
)
from satellite_approximation_tpu.utils.geotiff import GeoTIFF, write_geotiff
from satellite_approximation_tpu.utils.imageio import read_image, write_image
from satellite_approximation_tpu.utils.perf import PerfInfo
from satellite_approximation_tpu.models.detection.pipeline import Status
from satellite_approximation_tpu.models.closest import find_good_close_image

REF_SCENE = "/root/reference/test_data/2019-05-22"


class TestDate:
    def test_parse_and_format(self):
        d = Date.from_string("2019-05-22")
        assert (d.year, d.month, d.day) == (2019, 5, 22)
        assert str(d) == "2019-05-22"

    def test_ordering_and_days(self):
        a, b = Date(2019, 5, 22), Date(2019, 6, 1)
        assert a < b
        assert a.days_between(b) == 10

    def test_add_months_clamps(self):
        assert Date(2019, 1, 31).add_months(1) == Date(2019, 2, 28)
        assert Date(2019, 3, 15).add_months(-1) == Date(2019, 2, 15)
        assert Date(2019, 12, 5).add_months(1) == Date(2020, 1, 5)


class TestGeoTIFF:
    def test_read_reference_bands(self):
        t = GeoTIFF.open(f"{REF_SCENE}/B08.tif")
        a = t.read()
        assert a.shape == (1697, 1284)
        assert a.dtype == np.uint16
        assert t.north() == pytest.approx(57.105787570770836)
        assert t.west() == pytest.approx(-111.93141764318219)
        assert t.south() < t.north()
        assert t.east() > t.west()

    def test_big_endian_float_read(self):
        t = GeoTIFF.open(f"{REF_SCENE}/sunZenithAngles.tif")
        a = t.read()
        assert 30.0 < a.min() < a.max() < 45.0  # degrees, sane

    def test_template_copy_roundtrip(self, tmp_path):
        data = (np.arange(100, dtype=np.uint8).reshape(10, 10) % 2).astype(np.uint8)
        out = tmp_path / "mask.tif"
        write_geotiff(data, out, template_path=f"{REF_SCENE}/B08.tif")
        t = GeoTIFF.open(out)
        np.testing.assert_array_equal(t.read(), data)
        # geo metadata copied from the template
        ref = GeoTIFF.open(f"{REF_SCENE}/B08.tif")
        assert t.geo_transform == pytest.approx(ref.geo_transform)

    def test_index_at_and_midpoint(self):
        t = GeoTIFF.open(f"{REF_SCENE}/B08.tif")
        lat, lng = t.mid_point_of_pixel(10, 20)
        x, y = t.index_at(lat, lng)
        assert (x, y) == (10, 20)

    def test_value_domains(self):
        v = np.array([[1.0, 5.0], [-32768.0, 3.0]])
        assert GeoTIFF.value_domain(v) == (-32768.0, 5.0)
        assert GeoTIFF.dem_value_domain(v) == (1.0, 5.0)

    def test_multiband_write_roundtrip(self, tmp_path):
        """The reference's multi-band GeoTiffWriter variant (geotiff.h:98-195,
        poisson-main.cpp:66-71 writes one 5-band file)."""
        rng = np.random.default_rng(7)
        data = rng.random((5, 23, 17)).astype(np.float32)
        out = tmp_path / "multi.tif"
        write_geotiff(data, out, template_path=f"{REF_SCENE}/B08.tif")
        t = GeoTIFF.open(out)
        assert t.num_bands == 5
        np.testing.assert_array_equal(t.read_all(), data)
        np.testing.assert_array_equal(t.read(3), data[2])
        ref = GeoTIFF.open(f"{REF_SCENE}/B08.tif")
        assert t.geo_transform == pytest.approx(ref.geo_transform)

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float64])
    def test_multiband_dtypes(self, tmp_path, dtype):
        rng = np.random.default_rng(3)
        data = (rng.random((3, 9, 11)) * 200).astype(dtype)
        out = tmp_path / f"mb_{np.dtype(dtype).name}.tif"
        write_geotiff(data, out)
        t = GeoTIFF.open(out)
        got = t.read_all()
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, data)

    def test_bigtiff_roundtrip(self, tmp_path):
        """BigTIFF (version 43, 8-byte offsets): PIL rejects it, so reads
        route through the minimal codec. The reference gets this from GDAL
        (geotiff.h:234-273); outputs beyond 4 GB require it."""
        from satellite_approximation_tpu.utils.tiffmb import (
            read_tiff_tags, write_multiband_tiff,
        )

        rng = np.random.default_rng(11)
        data = (rng.random((3, 33, 47)) * 1e4).astype(np.float32)
        out = tmp_path / "big.tif"
        write_multiband_tiff(data, out, bigtiff=True)
        _, magic = __import__("struct").unpack("<2sH", out.read_bytes()[:4])
        assert magic == 43
        t = GeoTIFF.open(out)
        np.testing.assert_array_equal(t.read_all(), data)
        tags, little = read_tiff_tags(out.read_bytes())
        assert little and tags[256] == 47

    def test_tiled_deflate_roundtrip(self, tmp_path):
        """Tiled + deflate-compressed layout, incl. edge tiles that need
        cropping (33x47 image, 16x16 tiles)."""
        from satellite_approximation_tpu.utils.tiffmb import (
            read_multiband_tiff, write_multiband_tiff,
        )

        rng = np.random.default_rng(12)
        for dtype in (np.uint16, np.float32):
            data = (rng.random((2, 33, 47)) * 9e3).astype(dtype)
            out = tmp_path / f"tiled_{np.dtype(dtype).name}.tif"
            write_multiband_tiff(
                data, out, tile=(16, 16), compression="deflate", bigtiff=True
            )
            got, tags = read_multiband_tiff(out)
            assert tags[322] == 16 and tags[259] == 8  # TileWidth, deflate
            np.testing.assert_array_equal(got, data)

    def test_pil_written_compressed_variants(self, tmp_path):
        """Files other tools produce: PIL-encoded LZW and deflate strips
        must read back through both GeoTIFF.open (PIL path) and the minimal
        codec (the BigTIFF/planar fallback's decoder)."""
        from satellite_approximation_tpu.utils.tiffmb import read_multiband_tiff
        from PIL import Image

        rng = np.random.default_rng(13)
        data = (rng.random((40, 60)) * 255).astype(np.uint8)
        for comp in ("tiff_lzw", "tiff_adobe_deflate"):
            out = tmp_path / f"{comp}.tif"
            Image.fromarray(data).save(out, compression=comp)
            np.testing.assert_array_equal(GeoTIFF.open(out).read(), data)
            got, tags = read_multiband_tiff(out)
            np.testing.assert_array_equal(got[0], data)

    def test_non_wgs84_geotransform(self, tmp_path):
        """Projected (UTM zone 12N, like real Sentinel-2 L2A) geotransform:
        ModelPixelScale/Tiepoint in metres + a projected GeoKeyDirectory.
        The geodetic helpers operate on geotransform coordinates and must
        roundtrip in the projected frame too."""
        from satellite_approximation_tpu.utils.tiffmb import write_multiband_tiff

        data = (np.arange(30 * 20) % 251).astype(np.uint16).reshape(1, 30, 20)
        out = tmp_path / "utm.tif"
        # 10 m pixels anchored at easting 399960, northing 6300040 (UTM)
        geo_tags = [
            (33550, 12, (10.0, 10.0, 0.0)),  # ModelPixelScale
            (33922, 12, (0.0, 0.0, 0.0, 399960.0, 6300040.0, 0.0)),  # Tiepoint
            # GeoKeyDirectory: projected CRS, EPSG:32612
            (34735, 3, (1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, 32612)),
        ]
        write_multiband_tiff(data, out, extra_tags=geo_tags)
        t = GeoTIFF.open(out)
        assert t.geo_transform == pytest.approx(
            (399960.0, 10.0, 0.0, 6300040.0, 0.0, -10.0)
        )
        assert t.west() == pytest.approx(399960.0)
        assert t.north() == pytest.approx(6300040.0)
        assert t.east() == pytest.approx(399960.0 + 20 * 10.0)
        y, x = t.mid_point_of_pixel(7, 13)
        assert t.index_at(y, x) == (7, 13)

    def test_multiband_single_band_degenerate(self, tmp_path):
        data = np.arange(12, dtype=np.float32).reshape(1, 3, 4)
        out = tmp_path / "one.tif"
        write_geotiff(data, out)
        np.testing.assert_array_equal(GeoTIFF.open(out).read(), data[0])

    @staticmethod
    def _make_predictor2_tiff(
        data: np.ndarray, planar: bool, tile=None, deflate: bool = False
    ) -> bytes:
        """Hand-assemble a minimal classic little-endian TIFF whose payload
        is predictor-2 (horizontal differencing) encoded per TIFF 6.0 §14:
        each SAMPLE differenced independently along its row. ``data`` is
        (spp, h, w) integer. Independent of tiffmb's writer — this is the
        decode oracle's counterpart, not a roundtrip of our own encoder."""
        import struct as st

        spp, h, w = data.shape
        dt = data.dtype

        def hdiff(a):  # (…, w) -> differenced along the last axis, modulo dtype
            out = a.copy()
            out[..., 1:] = a[..., 1:] - a[..., :-1]
            return out

        segs = []  # raw (uncompressed) strip/tile payloads, in offset order
        if tile is not None:
            th, tw = tile
            down, across = -(-h // th), -(-w // tw)
            # pad edges by repeating the last row/col (content arbitrary)
            padded = np.pad(data, ((0, 0), (0, down * th - h), (0, across * tw - w)), mode="edge")
            for p in range(spp) if planar else [None]:
                for ty in range(down):
                    for tx in range(across):
                        blk = padded[:, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                        if planar:
                            segs.append(hdiff(blk[p]).tobytes())
                        else:
                            # chunky: (th, tw, spp), diff along tw per sample
                            chunky = np.moveaxis(blk, 0, -1)
                            segs.append(hdiff(np.swapaxes(chunky, 1, 2)).swapaxes(1, 2).tobytes())
        elif planar:
            for p in range(spp):
                segs.append(hdiff(data[p]).tobytes())
        else:
            chunky = np.moveaxis(data, 0, -1)  # (h, w, spp)
            segs.append(hdiff(np.swapaxes(chunky, 1, 2)).swapaxes(1, 2).tobytes())

        if deflate:
            import zlib

            segs = [zlib.compress(s) for s in segs]

        bits = dt.itemsize * 8
        entries = []  # (tag, type, count, value-or-values)
        def tagv(tag, ftype, vals):
            entries.append((tag, ftype, vals if isinstance(vals, (list, tuple)) else [vals]))

        n_ifd_guess = 14
        # layout: header(8) + IFD + out-of-line value area + payloads
        ifd_size = 2 + n_ifd_guess * 12 + 4
        val_area = 8 + ifd_size
        # reserve out-of-line space generously: bits arrays + offsets/counts
        extra = 4 * (2 * len(segs) + 2 * spp + 4)
        data_off = val_area + extra
        offs, cnts = [], []
        o = data_off
        for s in segs:
            offs.append(o)
            cnts.append(len(s))
            o += len(s)

        SHORT, LONG = 3, 4
        tagv(256, LONG, w)
        tagv(257, LONG, h)
        tagv(258, SHORT, [bits] * spp)
        tagv(259, SHORT, 8 if deflate else 1)
        tagv(262, SHORT, 2 if spp == 3 else 1)  # RGB for 3 samples (PIL mode)
        tagv(273, LONG, offs)
        tagv(277, SHORT, spp)
        tagv(278, LONG, h if tile is None else 0) if tile is None else None
        tagv(279, LONG, cnts)
        tagv(284, SHORT, 2 if planar else 1)
        tagv(317, SHORT, 2)  # predictor: horizontal differencing
        tagv(339, SHORT, [1] * spp)  # unsigned int samples
        if tile is not None:
            tagv(322, LONG, tile[1])
            tagv(323, LONG, tile[0])
            # tiled files use 324/325 instead of 273/279
            entries[:] = [e for e in entries if e[0] not in (273, 279)]
            tagv(324, LONG, offs)
            tagv(325, LONG, cnts)
        entries.sort(key=lambda e: e[0])

        out = bytearray(st.pack("<2sHI", b"II", 42, 8))
        ifd = bytearray(st.pack("<H", len(entries)))
        oov = bytearray()  # out-of-line values
        oov_base = 8 + 2 + len(entries) * 12 + 4
        fmt = {SHORT: "H", LONG: "I"}
        size = {SHORT: 2, LONG: 4}
        for tag, ftype, vals in entries:
            nbytes = size[ftype] * len(vals)
            packed = st.pack(f"<{len(vals)}{fmt[ftype]}", *vals)
            if nbytes <= 4:
                ifd += st.pack("<HHI", tag, ftype, len(vals)) + packed.ljust(4, b"\0")
            else:
                ifd += st.pack("<HHII", tag, ftype, len(vals), oov_base + len(oov))
                oov += packed
        ifd += st.pack("<I", 0)  # next-IFD pointer
        out += ifd + oov
        out = out.ljust(data_off, b"\0")
        for s in segs:
            out += s
        return bytes(out)

    def test_predictor2_decode_all_layouts(self, tmp_path):
        """Predictor-2 (horizontal differencing) must cumsum along the WIDTH
        axis per sample in every layout. The tiled-planar and chunky-spp>1
        cases regressed silently before round 5 (cumsum ran along the
        samples axis — a no-op for planar tiles, sample-mixing for chunky).
        Fixtures are hand-encoded per TIFF 6.0 §14, independent of our
        writer; the chunky-strip case is additionally cross-checked against
        PIL's decoder."""
        from satellite_approximation_tpu.utils.tiffmb import read_multiband_tiff

        rng = np.random.default_rng(21)
        for dtype in (np.uint8, np.uint16):
            data3 = (rng.random((3, 21, 37)) * np.iinfo(dtype).max).astype(dtype)
            data1 = data3[:1]
            cases = [
                ("strip_chunky", data3, False, None),
                ("strip_planar", data3, True, None),
                ("strip_chunky_1s", data1, False, None),
                ("tiled_chunky", data3, False, (16, 16)),
                ("tiled_planar", data3, True, (16, 16)),
                ("tiled_planar_1s", data1, True, (16, 16)),
            ]
            for name, data, planar, tile in cases:
                raw = self._make_predictor2_tiff(data, planar, tile)
                p = tmp_path / f"p2_{name}_{np.dtype(dtype).name}.tif"
                p.write_bytes(raw)
                got, tags = read_multiband_tiff(p)
                assert tags[317] == 2
                np.testing.assert_array_equal(got, data, err_msg=name)

        # independent decoder cross-check: PIL applies predictor 2 on
        # deflate-compressed chunky strips (it ignores the tag on raw
        # strips, so the cross-check file is compressed)
        from PIL import Image

        data = (rng.random((3, 21, 37)) * 255).astype(np.uint8)
        p = tmp_path / "p2_pil_check.tif"
        p.write_bytes(self._make_predictor2_tiff(data, planar=False, deflate=True))
        pil = np.array(Image.open(p))
        np.testing.assert_array_equal(np.moveaxis(pil, -1, 0), data)
        got, _ = read_multiband_tiff(p)
        np.testing.assert_array_equal(got, data)


class TestImageio:
    def test_gamma_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        rgb = rng.integers(0, 255, size=(3, 16, 20)).astype(np.float64) / 255.0
        decoded = np.power(rgb, 1 / 2.2)
        p = tmp_path / "x.png"
        write_image(decoded, p)
        back = read_image(p)
        # compare in the linear (encoded) domain: u8 quantization bounds error
        np.testing.assert_allclose(back ** 2.2, decoded ** 2.2, atol=1.5 / 255)


class TestDataBase:
    def test_detection_status_roundtrip(self, tmp_path):
        db = DataBase(tmp_path)
        date = Date(2019, 5, 22)
        db.write_detection_result(
            date,
            Status(
                percent_clouds=0.2,
                percent_shadows=0.05,
                percent_invalid=0.24,
                clouds_computed=True,
                shadows_computed=True,
            ),
        )
        status = db.get_status(date)
        assert status.clouds_exist and status.shadows_exist
        assert status.percent_invalid == pytest.approx(0.24)
        # upsert semantics
        db.write_detection_result(date, Status(percent_invalid=0.5, clouds_computed=True))
        assert db.get_status(date).percent_invalid == pytest.approx(0.5)

    def test_get_status_missing_row(self, tmp_path):
        db = DataBase(tmp_path)
        s = db.get_status(Date(2000, 1, 1))
        assert not s.clouds_exist and not s.shadows_exist

    def test_approx_results(self, tmp_path):
        db = DataBase(tmp_path)
        rid = db.write_approx_results("2019-05-22", "B04", ApproxMethod.Laplace)
        assert rid >= 1
        got = db.get_approx_status("2019-05-22", ApproxMethod.Laplace)
        assert got == {"B04": rid}
        assert db.get_approx_status("2019-05-22", ApproxMethod.Poisson) == {}

    def test_close_images_and_selection(self, tmp_path):
        db = DataBase(tmp_path)
        for day, inv in [(1, 0.5), (10, 0.05), (25, 0.9)]:
            db.write_detection_result(
                Date(2019, 5, day),
                Status(percent_invalid=inv, clouds_computed=True, shadows_computed=True),
            )
        db.write_detection_result(
            Date(2019, 7, 1), Status(percent_invalid=0.01, clouds_computed=True)
        )
        close = db.select_close_images(Date(2019, 5, 10))
        days = {(d.date.month, d.date.day) for d in close}
        assert (5, 1) in days and (5, 25) in days
        assert (5, 10) not in days  # excludes itself
        assert (7, 1) not in days  # outside the month window

    def test_find_good_close_image(self, tmp_path):
        db = DataBase(tmp_path)
        db.write_detection_result(Date(2019, 5, 10), Status(percent_invalid=0.5))
        db.write_detection_result(Date(2019, 5, 12), Status(percent_invalid=0.02))
        best = find_good_close_image("2019-05-10", 0.0, db)
        assert best == "2019-05-12"
        # current date already cleaner -> keep it
        db.write_detection_result(Date(2019, 6, 1), Status(percent_invalid=0.9))
        best = find_good_close_image("2019-06-01", 0.0, db)
        assert best == "2019-06-01" or best == "2019-05-12"

    def test_find_downloaded_dates(self, tmp_path):
        db = DataBase(tmp_path)
        db.write_detection_result(Date(2019, 5, 10), Status(clouds_computed=True))
        rows = db.find_downloaded_dates()
        assert rows == [(Date(2019, 5, 10), True)]


class TestFilesystem:
    def test_classification(self, tmp_path):
        ms = tmp_path / "2019-05-22"
        ms.mkdir()
        (ms / "B04.tif").touch()
        radar = tmp_path / "2019-06-01"
        radar.mkdir()
        other = tmp_path / "not-a-date"
        other.mkdir()
        assert find_directory_contents(ms) == DirectoryContents.MultiSpectral
        assert find_directory_contents(radar) == DirectoryContents.Radar
        assert find_directory_contents(other) == DirectoryContents.NoSatelliteData
        assert multispectral_folders(tmp_path) == [ms]


class TestPerfInfo:
    def test_csv_append(self, tmp_path):
        p = tmp_path / "perf.csv"
        PerfInfo(10, 1e-6, 5, 3, 1e-7, 12.5).write(p)
        PerfInfo(20, 1e-6, 5, 4, 1e-8, 13.5).write(p)
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 2
        assert lines[0].split(",")[0] == "10"
