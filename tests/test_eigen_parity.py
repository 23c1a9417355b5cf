"""True-Eigen parity: our solvers vs the reference's actual solver stack
(Eigen::ConjugateGradient<SparseMatrix<f64>, Lower|Upper>) on real satellite
data — the BASELINE.md 1e-5 per-pixel claim, proven against genuine Eigen
rather than a scipy stand-in. The oracle (tests/native_oracle/eigen_oracle.cpp)
re-implements the reference's exact assembly (laplace.cpp:31-119,
poisson.cpp:145-290) against the eigen headers vendored by the reference."""

import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

EIGEN = Path("/root/reference/thirdparty/eigen-master")
SRC = Path(__file__).resolve().parent / "native_oracle" / "eigen_oracle.cpp"
REF_SCENE = Path("/root/reference/test_data/2019-05-22")


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if not EIGEN.exists():
        pytest.skip("vendored Eigen not available")
    so = tmp_path_factory.mktemp("oracle") / "eigen_oracle.so"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", f"-I{EIGEN}",
             str(SRC), "-o", str(so)],
            check=True, capture_output=True, timeout=300,
        )
    except (OSError, subprocess.SubprocessError):
        pytest.skip("no C++ toolchain for the Eigen oracle")
    lib = ctypes.CDLL(str(so))
    lib.eigen_laplace_fill.restype = ctypes.c_int
    lib.eigen_poisson_blend.restype = ctypes.c_int
    return lib


def _real_crop(h=220, w=260, y0=400, x0=500):
    from satellite_approximation_tpu.utils.geotiff import GeoTIFF

    band = GeoTIFF.open(REF_SCENE / "B08.tif").read().astype(np.float64)
    return band[y0 : y0 + h, x0 : x0 + w] / 65535.0


def _blob_mask(h, w, seed=5, interior=True):
    r = np.random.default_rng(seed)
    m = np.zeros((h, w), bool)
    yy, xx = np.ogrid[:h, :w]
    for _ in range(5):
        cy, cx = r.integers(10, h - 10), r.integers(10, w - 10)
        ry, rx = r.integers(4, h // 8), r.integers(4, w // 8)
        m |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    if interior:
        # keep the mask off the image border: with border-touching invalid
        # pixels the reference's assembled system is ASYMMETRIC (identity
        # rows for pinned border pixels while neighbouring Laplacian rows
        # still carry +1 coefficients toward them, laplace.cpp:74-85 vs
        # :63-69) and Eigen CG's output on it is solver-noise-dependent —
        # see test_border_mask_quirk.
        m[:2, :] = m[-2:, :] = m[:, :2] = m[:, -2:] = False
    return m


def _laplace_oracle(lib, img, mask):
    out = np.ascontiguousarray(img, np.float64).copy()
    m = np.ascontiguousarray(mask, np.uint8)
    iters = lib.eigen_laplace_fill(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(img.shape[0]),
        ctypes.c_int(img.shape[1]),
    )
    return out, iters


class TestLaplaceEigenParity:
    def test_real_scene_crop(self, oracle):
        from satellite_approximation_tpu.models.laplace import (
            fill_missing_portion_smooth_boundary,
        )

        img = _real_crop()
        mask = _blob_mask(*img.shape)
        expected, iters = _laplace_oracle(oracle, img, mask)
        assert iters > 0
        ours = fill_missing_portion_smooth_boundary(img.copy(), mask)
        # BASELINE 1e-5 per-pixel parity vs the true Eigen CG solve
        assert np.abs(ours - expected).max() < 1e-5

    def test_border_mask_quirk(self, oracle):
        """Invalid pixels on the image border: the reference pins them
        (identity rows) but leaves +1 coefficients pointing at them from
        neighbouring Laplacian rows — an asymmetric system on which Eigen
        CG (assuming symmetry via Lower|Upper) lands near, but not exactly
        on, the pinned-Dirichlet solution. We implement the well-defined
        pinning semantics; parity vs true Eigen is therefore loose here
        (observed ~6e-3 worst case) while interior masks hold 1e-5."""
        img = _real_crop(h=80, w=90, y0=100, x0=200)
        mask = _blob_mask(80, 90, seed=9, interior=False)
        mask[0, 10:30] = True
        mask[:, -1] = True
        from satellite_approximation_tpu.models.laplace import (
            fill_missing_portion_smooth_boundary,
        )

        expected, _ = _laplace_oracle(oracle, img, mask)
        ours = fill_missing_portion_smooth_boundary(img.copy(), mask)
        assert np.abs(ours - expected).max() < 2e-2
        # we pin border-invalid pixels exactly; the reference scatters the
        # CG solution back into them, so it pins only approximately
        np.testing.assert_array_equal(ours[0, 10:30], img[0, 10:30])
        np.testing.assert_allclose(expected[0, 10:30], img[0, 10:30], atol=2e-2)


class TestPoissonEigenParity:
    def test_real_scene_blend(self, oracle):
        from satellite_approximation_tpu.models.poisson import blend_images_poisson

        img = np.stack([
            _real_crop(150, 170, 300, 400),
            _real_crop(150, 170, 700, 300),
            _real_crop(150, 170, 900, 600),
        ])
        repl = np.stack([
            _real_crop(150, 170, 350, 450),
            _real_crop(150, 170, 750, 350),
            _real_crop(150, 170, 950, 650),
        ])
        mask = _blob_mask(150, 170, seed=11)

        expected = np.ascontiguousarray(img, np.float64).copy()
        m = np.ascontiguousarray(mask, np.uint8)
        iters = oracle.eigen_poisson_blend(
            expected.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(repl, np.float64).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)
            ),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(3),
            ctypes.c_int(150),
            ctypes.c_int(170),
            ctypes.c_double(1e-10),
            ctypes.c_int(0),
        )
        assert iters > 0
        ours = blend_images_poisson(img, repl, invalid_mask=mask, tolerance=1e-10)
        assert np.abs(np.asarray(ours) - expected).max() < 1e-5
        # untouched outside the mask
        np.testing.assert_array_equal(np.asarray(ours)[:, ~mask], img[:, ~mask])
