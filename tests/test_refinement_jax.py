"""Host-vs-device equality for the refinement stages (refinement_jax).

The device backend must reproduce the host backend's numerics: exact masks
on real data, 1e-6-level closeness on the float surfaces (XLA FMA fusion
can differ from numpy by ulps in the f32 falloff)."""

from pathlib import Path

import numpy as np
import pytest

from satellite_approximation_tpu.config import DEFAULT_DETECTION
from satellite_approximation_tpu.models.detection import (
    cloud_mask as cm,
    matching,
    refinement,
    refinement_jax,
    shadow_mask as sm,
)
from satellite_approximation_tpu.ops import geometry
from satellite_approximation_tpu.utils.geotiff import GeoTIFF

from test_pipeline_e2e import REF_SCENE, R0, R1, C0, C1, crop_diagonal


class TestAlphaMap:
    def test_matches_host(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((64, 80)).astype(np.float32)
        host = refinement.alpha_map(x)
        dev = np.asarray(refinement_jax.alpha_map_jax(x))
        np.testing.assert_allclose(dev, host, atol=2e-7)


def _synthetic_match(h=72, w=90):
    """A hand-built accepted shadow: rectangular window, translation cast."""
    rng = np.random.default_rng(5)
    clp = rng.random((h, w)).astype(np.float32)
    win = np.zeros((16, 16), bool)
    win[3:12, 4:13] = True
    ys, xs = np.nonzero(win)
    anchor = (30, 20)  # (x, y-from-bottom)
    bounds = (
        anchor[0] + xs.min(), anchor[1] + ys.min(),
        anchor[0] + xs.max(), anchor[1] + ys.max(),
    )
    m = np.eye(4)
    m[0, 3] = 0.8  # shadow displaced east by .8 km
    m[1, 3] = -0.5
    shadows = {
        7: matching.ShadowObject(
            id=7, bounds=bounds, area=int(win.sum()), window=win, anchor=anchor
        )
    }
    solutions = {
        7: matching.OptimalSolution(height=1.5, similarity=0.9, M=m, id=7)
    }
    return shadows, solutions, clp


class TestBetaMap:
    def test_synthetic_matches_host(self):
        shadows, solutions, clp = _synthetic_match()
        diag = 12.0
        host = refinement.beta_map(shadows, solutions, clp, diag)
        dev = refinement_jax.beta_map_jax(shadows, solutions, clp, diag)
        assert host.any()
        np.testing.assert_allclose(dev, host, atol=1e-6)

    def test_no_accepted_shadows(self):
        clp = np.zeros((40, 40), np.float32)
        shadows = {
            1: matching.ShadowObject(id=1, bounds=None, area=0, window=None, anchor=None)
        }
        solutions = {
            1: matching.OptimalSolution(height=0.0, similarity=-1.0, M=np.eye(4), id=1)
        }
        dev = refinement_jax.beta_map_jax(shadows, solutions, clp, 10.0)
        assert not dev.any()

    def test_real_scene_matches_host(self):
        """Full host-vs-device agreement on the real crop: beta surfaces
        close, and the final improved shadow mask IDENTICAL when the device
        alpha/beta feed the (host) probability stage."""
        names = ["B08", "CLP", "CLD", "SCL",
                 "sunZenithAngles", "sunAzimuthAngles",
                 "viewZenithMean", "viewAzimuthMean"]
        data = {
            n: GeoTIFF.open(REF_SCENE / f"{n}.tif").read()[R0:R1, C0:C1]
            for n in names
        }
        diag = crop_diagonal()
        cfg = DEFAULT_DETECTION
        clp = data["CLP"].astype(np.float32) / 255
        cld = data["CLD"].astype(np.float32) / 100
        nir = data["B08"].astype(np.float32) / np.iinfo(np.uint16).max
        gen = cm.generate_cloud_mask_ignore_low_probability(clp, cld, data["SCL"], cfg.cloud_mask)
        cloud_map, clouds = cm.partition_cloud_mask(
            gen.cloud_mask_no_processing, diag, cfg.min_cloud_size_for_ray_casting
        )
        psm = sm.generate_potential_shadow_mask(
            nir, gen.cloud_mask_no_processing, data["SCL"], cfg.shadow_mask
        )
        shape = clp.shape
        sun_grid = geometry.vector_grid(
            np.radians(data["sunZenithAngles"].astype(np.float64)),
            np.radians(data["sunAzimuthAngles"].astype(np.float64)),
        )
        view_grid = geometry.vector_grid(
            np.radians(data["viewZenithMean"].astype(np.float64)),
            np.radians(data["viewAzimuthMean"].astype(np.float64)),
        )
        sun_pos = geometry.ls_point_equal_to(sun_grid, shape, diag, cfg.distance_to_sun_km)
        view_pos = geometry.ls_point_equal_to(view_grid, shape, diag, cfg.distance_to_view_km)
        match = matching.match_clouds_shadows(
            clouds, cloud_map, gen.cloud_mask_no_processing, psm.mask,
            diag, sun_pos, view_pos, cfg.matching,
        )
        assert any(s.area for s in match.shadows.values())

        alpha_h = refinement.alpha_map(psm.difference_of_pitfill_nir, cfg.refinement)
        alpha_d = np.asarray(refinement_jax.alpha_map_jax(psm.difference_of_pitfill_nir))
        np.testing.assert_allclose(alpha_d, alpha_h, atol=2e-7)

        beta_h = refinement.beta_map(
            match.shadows, match.solutions, gen.blended_cloud_probability, diag, cfg.refinement
        )
        beta_d = refinement_jax.beta_map_jax(
            match.shadows, match.solutions, gen.blended_cloud_probability, diag, cfg.refinement
        )
        np.testing.assert_allclose(beta_d, beta_h, atol=1e-6)

        surface = refinement.probability_map(match.shadow_mask, alpha_h, beta_h, cfg.refinement)
        final_h = refinement.improved_shadow_mask(
            match.shadow_mask, gen.cloud_mask, alpha_h, beta_h, surface,
            cfg.probability_threshold,
        )
        surface_d = refinement.probability_map(match.shadow_mask, alpha_d, beta_d, cfg.refinement)
        final_d = refinement.improved_shadow_mask(
            match.shadow_mask, gen.cloud_mask, alpha_d, beta_d, surface_d,
            cfg.probability_threshold,
        )
        np.testing.assert_array_equal(final_d, final_h)

        # device histograms -> identical surface data (scatter-add sums of
        # 0/1 indicators are exact integers, so the element grids match
        # bit-for-bit)
        surface_dj = refinement_jax.probability_map_jax(
            match.shadow_mask, alpha_h, beta_h, cfg.refinement
        )
        np.testing.assert_array_equal(surface_dj.data, surface.data)

        # device sampling of the same surface -> identical final mask
        final_dev = refinement_jax.improved_shadow_mask_jax(
            match.shadow_mask, gen.cloud_mask, alpha_h, beta_h, surface,
            cfg.probability_threshold,
        )
        np.testing.assert_array_equal(final_dev, final_h)


class TestBandedEDT:
    def test_banded_matches_full_within_band(self):
        """The banded min-plus pass is exact for true distances <= band and
        only over-estimates (> band^2) beyond it — the property beta relies
        on to band the EDT at the influence radius."""
        rng = np.random.default_rng(11)
        seeds = rng.random((96, 160)) < 0.003
        seeds[:, :40] = False  # a seed-free strip wider than the band
        full = np.asarray(refinement_jax._edt_sq(seeds, 96, 160, band=None))
        for band in (8, 16, 33):
            banded = np.asarray(refinement_jax._edt_sq(seeds, 96, 160, band=band))
            near = full <= band * band
            np.testing.assert_array_equal(banded[near], full[near])
            assert (banded >= full).all()  # subset min never under-estimates
            assert (banded[~near] > band * band).all()

    def test_beta_narrow_band_matches_host(self):
        """Force band << window width (big window, small beta_max_distance)
        and assert device beta still matches the host oracle exactly where
        it matters."""
        from satellite_approximation_tpu.config import RefinementConfig

        rng = np.random.default_rng(7)
        h, w = 140, 220
        clp = rng.random((h, w)).astype(np.float32)
        win = np.zeros((100, 180), bool)
        win[8:92:7, 6:174] = True  # sparse stripes: long internal borders
        ys, xs = np.nonzero(win)
        anchor = (10, 20)
        bounds = (
            anchor[0] + xs.min(), anchor[1] + ys.min(),
            anchor[0] + xs.max(), anchor[1] + ys.max(),
        )
        shadows = {
            3: matching.ShadowObject(
                id=3, bounds=bounds, area=int(win.sum()), window=win, anchor=anchor
            )
        }
        solutions = {3: matching.OptimalSolution(height=1.0, similarity=0.8, M=np.eye(4), id=3)}
        cfg = RefinementConfig(beta_max_distance=12.0)
        host = refinement.beta_map(shadows, solutions, clp, 9.0, cfg)
        dev = refinement_jax.beta_map_jax(shadows, solutions, clp, 9.0, cfg)
        assert host.any()
        np.testing.assert_allclose(dev, host, atol=1e-6)


class TestProbabilitySurfaceJax:
    def test_histograms_match_host_on_random(self):
        """Random (alpha, beta, shadow): device surface == host surface."""
        from satellite_approximation_tpu.config import RefinementConfig

        rng = np.random.default_rng(11)
        h, w = 120, 170
        alpha = rng.random((h, w)).astype(np.float32)
        beta = rng.random((h, w)).astype(np.float32)
        # leave some histogram cells empty so the hole-fill path runs
        beta[beta > 0.7] = 0.05
        shadow = rng.random((h, w)) < 0.2
        cfg = RefinementConfig()
        host = refinement.probability_map(shadow, alpha, beta, cfg)
        dev = refinement_jax.probability_map_jax(shadow, alpha, beta, cfg)
        np.testing.assert_array_equal(dev.data, host.data)
        np.testing.assert_array_equal(
            (dev.alpha_min, dev.beta_min), (host.alpha_min, host.beta_min)
        )

    def test_histograms_non_nested_divisions(self):
        """Divisions that don't divide a finer one fall back to a direct
        scatter pass; mixed nested/non-nested configs stay exact vs host."""
        rng = np.random.default_rng(17)
        h, w = 96, 133
        alpha = rng.random((h, w)).astype(np.float32)
        beta = rng.random((h, w)).astype(np.float32)
        shadow = rng.random((h, w)) < 0.3
        divisions = (8, 12, 48, 128)  # 12 and 48 don't divide 128
        dev = refinement_jax._histograms_jax(alpha, beta, shadow.astype(np.float32), divisions)
        for (dc, ds), d in zip(dev, divisions):
            i = np.clip(np.floor(alpha * d).astype(np.int64), 0, d - 1)
            j = np.clip(np.floor(beta * d).astype(np.int64), 0, d - 1)
            cell = (i + d * j).ravel()
            hc = np.bincount(cell, minlength=d * d).reshape(d, d)
            hs = np.bincount(
                cell, weights=shadow.ravel().astype(np.float64), minlength=d * d
            ).reshape(d, d)
            np.testing.assert_array_equal(np.asarray(dc), hc)
            np.testing.assert_array_equal(np.asarray(ds), hs.astype(np.int64))

    def test_final_sampling_matches_host_on_random(self):
        rng = np.random.default_rng(13)
        h, w = 90, 140
        alpha = rng.random((h, w)).astype(np.float32)
        beta = rng.random((h, w)).astype(np.float32)
        surface = refinement.UniformProbabilitySurface(
            rng.random((256, 256)).astype(np.float32)
        )
        surface.alpha_min = 0.0
        surface.beta_min = 0.0
        obj = rng.random((h, w)) < 0.1
        cloud = rng.random((h, w)) < 0.1
        host = refinement.improved_shadow_mask(obj, cloud, alpha, beta, surface, 0.15)
        dev = refinement_jax.improved_shadow_mask_jax(obj, cloud, alpha, beta, surface, 0.15)
        np.testing.assert_array_equal(dev, host)


class TestPipelineBackendSwitch:
    def test_detect_with_jax_backend_matches_host(self, tmp_path):
        """detect() with RefinementConfig.backend='jax' writes the same four
        masks as the host backend on the real crop."""
        import dataclasses
        import shutil

        from satellite_approximation_tpu.models.detection.pipeline import (
            CloudParams,
            detect,
        )

        names = ["B08", "CLP", "CLD", "SCL",
                 "sunZenithAngles", "sunAzimuthAngles",
                 "viewZenithMean", "viewAzimuthMean"]
        src = tmp_path / "src"
        src.mkdir()
        from satellite_approximation_tpu.utils.geotiff import write_geotiff

        for n in names:
            data = GeoTIFF.open(REF_SCENE / f"{n}.tif").read()[R0:R1, C0:C1]
            write_geotiff(data, src / f"{n}.tif", template_path=REF_SCENE / "B08.tif")

        diag = crop_diagonal()
        a_dir, b_dir = tmp_path / "host", tmp_path / "jax"
        for d in (a_dir, b_dir):
            shutil.copytree(src, d)
        detect(CloudParams.from_root(a_dir), diag, use_cache=False)
        cfg = dataclasses.replace(
            DEFAULT_DETECTION,
            refinement=dataclasses.replace(DEFAULT_DETECTION.refinement, backend="jax"),
        )
        detect(CloudParams.from_root(b_dir), diag, use_cache=False, config=cfg)
        for name in ("cloud_mask", "potential_shadows", "object_based_shadows", "shadow_mask"):
            ga = GeoTIFF.open(a_dir / f"{name}.tif").read()
            gb = GeoTIFF.open(b_dir / f"{name}.tif").read()
            np.testing.assert_array_equal(gb, ga, err_msg=name)
