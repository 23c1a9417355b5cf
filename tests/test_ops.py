"""Unit tests for the ops layer against independent oracles (scipy/cv2/numpy).

Mirrors (and substantially extends) the reference's intended unit-test
coverage (tests/approximation.h: valid_neighbours/flood/connected components),
which was orphaned and could not even build — see SURVEY.md §4.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from satellite_approximation_tpu.ops import (
    gaussian_blur,
    strip_kernel,
    scl_mask,
    SCL,
    cover_percentage,
    normalize,
    ellipse_kernel,
    dilate,
    erode,
    close,
    cv_gaussian_blur,
    pit_fill,
    connected_components,
    partition_regions,
    percentile,
    linear_step,
    trimmed_average,
    masked_percentile,
)

rng = np.random.default_rng(42)


def reference_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Direct NumPy port of the OpenCL Gaussian blur (GaussianBlur.cpp:26-110)."""
    k = strip_kernel(sigma)
    radius = len(k) - 1

    def reflect(v, end):
        v = np.asarray(v)
        v = np.where(v < 0, -v, v)
        return np.where(v >= end, 2 * end - v - 1, v)

    h, w = img.shape
    out = np.zeros_like(img, dtype=np.float32)
    # horizontal
    for x in range(w):
        acc = k[0] * img[:, x].astype(np.float32)
        for i in range(1, radius + 1):
            acc = acc + k[i] * (
                img[:, reflect(x + i, w)] + img[:, reflect(x - i, w)]
            )
        out[:, x] = acc
    out2 = np.zeros_like(out)
    for y in range(h):
        acc = k[0] * out[y, :]
        for i in range(1, radius + 1):
            acc = acc + k[i] * (out[reflect(y + i, h), :] + out[reflect(y - i, h), :])
        out2[y, :] = acc
    return out2


class TestBlur:
    @pytest.mark.parametrize("sigma", [1.0, 4.0, 2.5])
    def test_matches_reference_port(self, sigma):
        img = rng.random((37, 53)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
        ref = reference_blur(img, sigma)
        np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-6)

    def test_kernel_normalized(self):
        for sigma in (0.5, 1.0, 4.0):
            k = strip_kernel(sigma)
            assert abs(k[0] + 2 * k[1:].sum() - 1.0) < 1e-6

    def test_batched(self):
        img = rng.random((3, 16, 24)).astype(np.float32)
        out = np.asarray(gaussian_blur(jnp.asarray(img), 1.0))
        for c in range(3):
            single = np.asarray(gaussian_blur(jnp.asarray(img[c]), 1.0))
            np.testing.assert_allclose(out[c], single, atol=1e-6)


class TestMorphology:
    @pytest.mark.parametrize("radius", [1, 2, 5, 15])
    def test_ellipse_kernel_matches_opencv(self, radius):
        cv2 = pytest.importorskip("cv2")
        k = 2 * radius + 1
        ours = ellipse_kernel(radius)
        theirs = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        np.testing.assert_array_equal(ours, theirs)

    @pytest.mark.parametrize("radius", [2, 5])
    def test_dilate_erode_close_match_opencv(self, radius):
        cv2 = pytest.importorskip("cv2")
        mask = (rng.random((64, 80)) > 0.85).astype(np.uint8)
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * radius + 1, 2 * radius + 1))
        np.testing.assert_array_equal(
            np.asarray(dilate(jnp.asarray(mask.astype(bool)), radius)),
            cv2.dilate(mask, k).astype(bool),
        )
        np.testing.assert_array_equal(
            np.asarray(erode(jnp.asarray(mask.astype(bool)), radius)),
            cv2.erode(mask, k).astype(bool),
        )
        np.testing.assert_array_equal(
            np.asarray(close(jnp.asarray(mask.astype(bool)), radius)),
            cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k).astype(bool),
        )

    def test_cv_gaussian_blur_close_to_opencv_float(self):
        cv2 = pytest.importorskip("cv2")
        img = rng.random((40, 56)).astype(np.float32)
        ours = np.asarray(cv_gaussian_blur(jnp.asarray(img), 11))
        theirs = cv2.GaussianBlur(img, (11, 11), 0.0)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPitFill:
    def pit_fill_oracle(self, orig: np.ndarray, border: float) -> np.ndarray:
        """Jacobi fixpoint, straight NumPy (PitFillAlgorithm.cpp:28-91)."""
        f = np.ones_like(orig, dtype=np.float32)
        while True:
            p = np.pad(f, 1, constant_values=border)
            m = np.full_like(f, np.inf)
            h, w = f.shape
            for dr in range(3):
                for dc in range(3):
                    if dr == 1 and dc == 1:
                        continue
                    m = np.minimum(m, p[dr : dr + h, dc : dc + w])
            nf = np.maximum(orig, m)
            if np.array_equal(nf, f):
                return f
            f = nf

    def test_matches_oracle(self):
        orig = rng.random((24, 31)).astype(np.float32)
        border = 0.6
        ours = np.asarray(pit_fill(jnp.asarray(orig), border))
        oracle = self.pit_fill_oracle(orig, border)
        np.testing.assert_array_equal(ours, oracle)

    def test_fills_single_pit(self):
        orig = np.full((9, 9), 0.5, dtype=np.float32)
        orig[4, 4] = 0.1  # a pit walled in by 0.5 terrain
        # border below the wall: the wall still holds water at 0.5
        out = np.asarray(pit_fill(jnp.asarray(orig), 0.2))
        assert out[4, 4] == pytest.approx(0.5)
        assert out[0, 0] == pytest.approx(0.5)

    def test_drains_through_channel(self):
        orig = np.full((9, 9), 0.5, dtype=np.float32)
        orig[4, 4] = 0.1
        orig[4, 5:] = 0.3  # a spill channel at 0.3 from the pit to the edge
        out = np.asarray(pit_fill(jnp.asarray(orig), 0.2))
        # the pit drains through the channel down to the channel level
        assert out[4, 4] == pytest.approx(0.3)
        assert out[4, 8] == pytest.approx(0.3)

    def test_hierarchical_path_matches_oracle(self):
        """Grid above the pyramid threshold (exercises the coarse-to-fine
        initialization) with a 1-px-wide snaking drain channel — max-pooling
        seals such channels in the coarse upper bound, so the fine sweeps
        must reopen them exactly."""
        h, w = 150, 220
        orig = (0.4 + 0.5 * rng.random((h, w))).astype(np.float32)
        orig[30:120, 20:200] = 0.9  # high wall region
        orig[35:115, 25:195] = 0.15  # deep basin inside
        # snake channel: along row 40 to the right wall, up column 197,
        # out through row 2
        orig[40, 25:198] = 0.25
        orig[2:41, 197] = 0.25
        orig[2, 197:] = 0.25
        border = 0.05
        ours = np.asarray(pit_fill(jnp.asarray(orig), border))
        oracle = self.pit_fill_oracle(orig, border)
        np.testing.assert_array_equal(ours, oracle)

    def test_hierarchical_odd_sizes_match_oracle(self):
        for shape in ((65, 130), (127, 129), (96, 67)):
            orig = rng.random(shape).astype(np.float32)
            ours = np.asarray(pit_fill(jnp.asarray(orig), 0.5))
            oracle = self.pit_fill_oracle(orig, 0.5)
            np.testing.assert_array_equal(ours, oracle)


class TestConnectedComponents:
    def test_matches_scipy(self):
        from scipy import ndimage

        mask = rng.random((60, 75)) > 0.6
        ours = np.asarray(connected_components(jnp.asarray(mask)))
        theirs, n = ndimage.label(mask, structure=np.ones((3, 3)))
        # same partition: bijection between our representative ids and scipy's
        pairs = {}
        h, w = mask.shape
        for r in range(h):
            for c in range(w):
                if mask[r, c]:
                    key = theirs[r, c]
                    if key in pairs:
                        assert pairs[key] == ours[r, c]
                    else:
                        pairs[key] = ours[r, c]
        assert len(set(pairs.values())) == n

    def test_partition_min_area_and_order(self):
        mask = np.zeros((10, 12), dtype=bool)
        mask[1, 1] = True  # area 1 — dropped at min_area=3
        mask[4:7, 2:4] = True  # area 6, leftmost
        mask[7:9, 8:11] = True  # area 6, right of the first
        id_map, regions = partition_regions(mask, min_area=3)
        assert len(regions) == 2
        assert id_map[1, 1] == -1
        # reference order: scan x (cols) outer — the col=2 cloud gets id 0
        assert id_map[5, 2] == 0
        assert id_map[8, 9] == 1
        r0 = regions[0]
        assert (r0.row_min, r0.row_max, r0.col_min, r0.col_max, r0.area) == (4, 6, 2, 3, 6)

    def test_connectivity4(self):
        mask = np.array([[1, 0], [0, 1]], dtype=bool)
        lab8 = np.asarray(connected_components(jnp.asarray(mask), 8))
        lab4 = np.asarray(connected_components(jnp.asarray(mask), 4))
        assert lab8[0, 0] == lab8[1, 1]
        assert lab4[0, 0] != lab4[1, 1]


class TestStats:
    def test_percentile_reference_semantics(self):
        vals = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
        # x = int(p*5); element x-1 of sorted [1..5]
        assert percentile(vals, 0.4) == 2.0
        assert percentile(vals, 0.0) == 0.0  # underflow -> 0.0 (Functions.cpp:33)
        assert percentile(vals, 1.0) == 5.0

    def test_masked_percentile_matches_host(self):
        vals = rng.random((17, 13)).astype(np.float32)
        mask = rng.random((17, 13)) > 0.5
        got = float(masked_percentile(jnp.asarray(vals), jnp.asarray(mask), 0.4))
        want = percentile(vals[mask], 0.4)
        assert got == pytest.approx(want)

    def test_linear_step(self):
        assert linear_step(0.0, (0.07, 0.4), (0.2, 0.7)) == 0.4
        assert linear_step(0.5, (0.07, 0.4), (0.2, 0.7)) == 0.7
        mid = linear_step(0.135, (0.07, 0.4), (0.2, 0.7))
        assert 0.4 < mid < 0.7

    def test_trimmed_average(self):
        vals = np.arange(10, dtype=np.float32)
        # min_index=1, max_index=9 -> mean of 1..9 = 5
        assert trimmed_average(vals, 0.1, 0.9) == pytest.approx(5.0)
        assert np.isnan(trimmed_average(np.array([]), 0.1, 0.9))


class TestMasks:
    def test_scl_mask(self):
        scl = np.array([[0, 8], [9, 3]], dtype=np.uint8)
        m = np.asarray(scl_mask(jnp.asarray(scl), (SCL.CLOUD_MEDIUM, SCL.CLOUD_HIGH)))
        np.testing.assert_array_equal(m, [[False, True], [True, False]])

    def test_cover_and_normalize(self):
        m = jnp.asarray(np.array([[True, False], [True, True]]))
        assert float(cover_percentage(m)) == pytest.approx(0.75)
        x = np.array([[255, 0]], dtype=np.uint8)
        np.testing.assert_allclose(np.asarray(normalize(jnp.asarray(x), 255)), [[1.0, 0.0]])

    @pytest.mark.parametrize("shape", [(1, 1), (3, 5), (64, 64), (17, 33)])
    def test_push_fetch_mask_roundtrip(self, shape):
        from satellite_approximation_tpu.ops.masks import fetch_mask, push_mask

        rng = np.random.default_rng(int(np.prod(shape)))
        m = rng.random(shape) < 0.37
        up = push_mask(m)  # H2D at 1 bit/px
        assert up.dtype == jnp.bool_ and up.shape == shape
        np.testing.assert_array_equal(np.asarray(up), m)
        np.testing.assert_array_equal(fetch_mask(up), m)  # D2H at 1 bit/px
        # device arrays pass through unchanged
        np.testing.assert_array_equal(np.asarray(push_mask(up)), m)


class TestPitFillHost:
    def test_host_orchestrated_matches_jit(self):
        """pit_fill_host (sweep-budgeted programs, host convergence loop)
        must produce the identical fixpoint."""
        from satellite_approximation_tpu.ops.pitfill import pit_fill_host

        h, w = 150, 220
        orig = (0.4 + 0.5 * rng.random((h, w))).astype(np.float32)
        orig[30:120, 20:200] = 0.9
        orig[35:115, 25:195] = 0.15
        orig[40, 25:198] = 0.25
        orig[2:41, 197] = 0.25
        orig[2, 197:] = 0.25
        a = np.asarray(pit_fill(jnp.asarray(orig), 0.05))
        # tiny budget forces many host continuation rounds
        b = np.asarray(pit_fill_host(orig, 0.05, sweep_budget_elems=h * w * 4))
        np.testing.assert_array_equal(b, a)

    def test_directional_cycles_preserve_exactness(self, monkeypatch):
        """With the size gate lowered, the directional-scan path must still
        land on the oracle fixpoint exactly."""
        from satellite_approximation_tpu.ops import pitfill as pf

        monkeypatch.setattr(pf, "_DIRECTIONAL_MIN_SIZE", 1)
        h, w = 150, 220
        orig = (0.4 + 0.5 * rng.random((h, w))).astype(np.float32)
        orig[30:120, 20:200] = 0.9
        orig[35:115, 25:195] = 0.15
        orig[40, 25:198] = 0.25
        orig[2:41, 197] = 0.25
        orig[2, 197:] = 0.25
        a = np.asarray(pit_fill(jnp.asarray(orig), 0.05))
        b = np.asarray(pf.pit_fill_host(orig, 0.05))
        np.testing.assert_array_equal(b, a)
        # pure-noise terrain too (the adversarial case for the pyramid)
        noise = rng.random((130, 170)).astype(np.float32)
        a = np.asarray(pit_fill(jnp.asarray(noise), 0.3))
        b = np.asarray(pf.pit_fill_host(noise, 0.3))
        np.testing.assert_array_equal(b, a)
