"""Native C++ helpers vs their pure-Python counterparts."""

import numpy as np
import pytest

from satellite_approximation_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def python_hole_fill(grid, valid):
    d = grid.shape[0]
    grid = grid.copy()
    val = valid.copy()
    empty = [(i, j) for i in range(d) for j in range(d) if not val[j, i]]
    while empty:
        progressed = False
        remaining = []
        for (i, j) in empty:
            accum = weight = 0.0
            found = False
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    if di == 0 and dj == 0:
                        continue
                    ni, nj = i + di, j + dj
                    if 0 <= ni < d and 0 <= nj < d and val[nj, ni]:
                        found = True
                        w = 1.0 / (di * di + dj * dj)
                        accum += float(grid[nj, ni]) * w
                        weight += w
            if found:
                val[j, i] = True
                grid[j, i] = np.float32(accum / weight)
                progressed = True
            else:
                remaining.append((i, j))
        if not progressed:
            break
        empty = remaining
    return grid, val


class TestHoleFill:
    def test_matches_python(self):
        rng = np.random.default_rng(0)
        d = 16
        grid = rng.random((d, d)).astype(np.float32)
        valid = rng.random((d, d)) > 0.6
        grid[~valid.T.T] = 0  # zero holes like the histogram builder does
        g_py, v_py = python_hole_fill(grid, valid)
        g_c, v_c = native.hole_fill(grid, valid)
        np.testing.assert_array_equal(v_c, v_py)
        np.testing.assert_allclose(g_c, g_py, atol=2e-6)

    def test_empty_grid_terminates(self):
        grid = np.zeros((8, 8), np.float32)
        valid = np.zeros((8, 8), bool)
        g, v = native.hole_fill(grid, valid)
        assert not v.any()


class TestFloodPartition:
    def test_matches_partition_regions(self):
        # compare against the DEVICE label-propagation path explicitly
        # (partition_regions itself now routes host masks to the native
        # flood, which would make a host-mask comparison circular)
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.components import partition_regions

        rng = np.random.default_rng(1)
        mask = rng.random((48, 64)) > 0.7
        labels_c, n_c = native.flood_partition(mask, 3)
        id_map, regions = partition_regions(jnp.asarray(mask), min_area=3)
        assert n_c == len(regions)
        np.testing.assert_array_equal(labels_c, id_map)

    def test_host_path_matches_device_path(self):
        import jax.numpy as jnp
        from satellite_approximation_tpu.ops.components import partition_regions

        rng = np.random.default_rng(7)
        mask = rng.random((53, 41)) > 0.6
        id_host, reg_host = partition_regions(mask, min_area=2)
        id_dev, reg_dev = partition_regions(jnp.asarray(mask), min_area=2)
        np.testing.assert_array_equal(id_host, np.asarray(id_dev))
        assert len(reg_host) == len(reg_dev)
        for a, b in zip(reg_host, reg_dev):
            assert (a.id, a.row_min, a.row_max, a.col_min, a.col_max, a.area) == (
                b.id, b.row_min, b.row_max, b.col_min, b.col_max, b.area
            )

    def test_min_area(self):
        mask = np.zeros((8, 8), bool)
        mask[1, 1] = True
        mask[4:6, 4:6] = True
        labels, n = native.flood_partition(mask, 2)
        assert n == 1
        assert labels[1, 1] == -1
        assert labels[4, 4] == 0


class TestBorderMask:
    def test_matches_python(self):
        from satellite_approximation_tpu.models.detection.refinement import _border_mask

        rng = np.random.default_rng(2)
        mask = rng.random((20, 25)) > 0.4
        np.testing.assert_array_equal(native.border_mask(mask), _border_mask(mask))


class TestPitFillFlood:
    def test_matches_jacobi_fixpoint(self):
        from satellite_approximation_tpu import native
        from satellite_approximation_tpu.ops.pitfill import pit_fill
        import jax.numpy as jnp

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(17)
        for shape, border in (((60, 83), 0.3), ((120, 95), 0.6)):
            orig = rng.random(shape).astype(np.float32)
            out = native.pit_fill_flood(orig, border)
            expect = np.asarray(pit_fill(jnp.asarray(orig), border))
            np.testing.assert_array_equal(out, expect)

    def test_drain_channel(self):
        from satellite_approximation_tpu import native

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        orig = np.full((9, 9), 0.5, np.float32)
        orig[4, 4] = 0.1
        orig[4, 5:] = 0.3
        out = native.pit_fill_flood(orig, 0.2)
        assert out[4, 4] == pytest.approx(0.3)


class TestProbHistogramsNative:
    def test_matches_bincount(self):
        from satellite_approximation_tpu import native

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(23)
        alpha = rng.random((70, 91)).astype(np.float32)
        beta = rng.random((70, 91)).astype(np.float32)
        shadow = rng.random((70, 91)) < 0.25
        divs = (8, 16, 32, 64, 128)
        hs = native.prob_histograms(alpha, beta, shadow, divs)
        for (c, s), d in zip(hs, divs):
            i = np.clip(np.floor(alpha.ravel() * d).astype(np.int64), 0, d - 1)
            j = np.clip(np.floor(beta.ravel() * d).astype(np.int64), 0, d - 1)
            cell = i + d * j
            np.testing.assert_array_equal(c, np.bincount(cell, minlength=d * d).reshape(d, d))
            np.testing.assert_array_equal(
                s,
                np.bincount(
                    cell, weights=shadow.ravel().astype(np.float64), minlength=d * d
                ).reshape(d, d),
            )


class TestHostNativeShadowStage:
    def test_matches_device_kernel(self, monkeypatch):
        """The full host-native shadow stage (priority flood + host blur)
        must reproduce the fused device kernel's outputs on the same data."""
        from satellite_approximation_tpu import native
        from satellite_approximation_tpu.models.detection import shadow_mask as sm

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(29)
        h, w = 120, 160
        nir = (rng.random((h, w)) * 0.4).astype(np.float32)
        cloud = rng.random((h, w)) < 0.15
        scl = rng.integers(0, 12, (h, w)).astype(np.uint8)
        dev = sm.generate_potential_shadow_mask(nir, cloud, scl)
        host = sm._generate_host_native(nir, cloud, scl, sm.ShadowMaskConfig())
        np.testing.assert_array_equal(host.pitfill_result, dev.pitfill_result)
        np.testing.assert_allclose(
            host.difference_of_pitfill_nir, dev.difference_of_pitfill_nir, atol=1e-7
        )
        np.testing.assert_array_equal(host.mask, dev.mask)


class TestFinalMaskNative:
    def test_matches_numpy_sampling(self):
        from satellite_approximation_tpu import native
        from satellite_approximation_tpu.models.detection import refinement

        if native.get_lib() is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(31)
        h, w = 140, 95
        alpha = rng.random((h, w)).astype(np.float32)
        beta = rng.random((h, w)).astype(np.float32)
        surface = refinement.UniformProbabilitySurface(
            rng.random((256, 256)).astype(np.float32)
        )
        surface.alpha_min = 0.0
        surface.beta_min = 0.0
        obj = rng.random((h, w)) < 0.1
        cloud = rng.random((h, w)) < 0.1
        expect = (surface.sample(alpha, beta) >= np.float32(0.15)) | obj
        expect &= ~cloud
        got = native.final_mask_sample(
            alpha, beta, surface._extended(), obj, cloud, 0.15
        )
        np.testing.assert_array_equal(got, expect)
