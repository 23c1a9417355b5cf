"""The reference README demos on the real demo assets (BASELINE configs 1-2).

The lake image is pruned from the reference mount (.MISSING_LARGE_BLOBS), so
config 1 runs on a synthetic lake-like image; config 2 uses the real
beach.jpg + chair.png seamless clone (README.md:60-73)."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from satellite_approximation_tpu.models.poisson import blend_images_poisson, valid_pixel_mask
from satellite_approximation_tpu.models.laplace import apply_laplace
from satellite_approximation_tpu.utils.imageio import read_image, write_image

BEACH = Path("/root/reference/images/beach.jpg")
CHAIR = Path("/root/reference/images/chair.png")


def load_gamma(path, scale):
    im = Image.open(path).convert("RGB")
    im = im.resize((im.width // scale, im.height // scale), Image.BILINEAR)
    rgb = np.asarray(im, dtype=np.float64) / 255.0
    return np.moveaxis(np.power(rgb, 1 / 2.2), -1, 0)


class TestBeachChairClone:
    def test_seamless_clone(self):
        beach = load_gamma(BEACH, 8)  # ~578x384
        chair = load_gamma(CHAIR, 4)  # ~182x256
        mask = valid_pixel_mask(chair)
        # the chair's white background is the sentinel (~2/3 of the patch)
        assert 0.2 < mask.mean() < 0.5

        row, col = 100, 300
        out = blend_images_poisson(beach, chair, start_row=row, start_column=col)
        ch, cw = chair.shape[-2:]
        window = out[:, row : row + ch, col : col + cw]
        beach_window = beach[:, row : row + ch, col : col + cw]
        # sentinel pixels untouched, chair pixels blended in
        np.testing.assert_array_equal(window[:, ~mask], beach_window[:, ~mask])
        assert np.abs(window[:, mask] - beach_window[:, mask]).max() > 0.01
        # blended values stay in a sane photometric range
        assert window.min() > -0.5 and window.max() < 1.5
        # seam smoothness: the blended boundary ring matches the beach closely
        from scipy import ndimage

        ring = mask & ~ndimage.binary_erosion(mask, iterations=2)
        inner = ndimage.binary_erosion(mask, iterations=6)
        seam_delta = np.abs(window[:, ring] - beach_window[:, ring]).mean()
        naive_delta = np.abs(chair[:, ring] - beach_window[:, ring]).mean()
        inner_delta = np.abs(window[:, inner] - beach_window[:, inner]).mean()
        # membrane continuity: the blend hugs the beach at the boundary and
        # diverges toward the chair content inward
        assert seam_delta < naive_delta
        assert seam_delta < 0.35 * inner_delta

    def test_write_demo_output(self, tmp_path):
        beach = load_gamma(BEACH, 12)
        chair = load_gamma(CHAIR, 8)
        out = blend_images_poisson(beach, chair, start_row=60, start_column=180)
        write_image(np.clip(out, 0, 1), tmp_path / "beach_chair.png")
        assert (tmp_path / "beach_chair.png").exists()


class TestLakeStyleLaplace:
    def test_marker_driven_fill(self):
        # synthetic stand-in for the pruned lake_with_invalid_areas.jpg:
        # smooth scene + red-marked invalid regions in the marker image
        rng = np.random.default_rng(0)
        h, w = 120, 160
        base = np.zeros((h, w, 3))
        yy, xx = np.mgrid[:h, :w]
        base[..., 0] = 100 + 50 * np.sin(yy / 17.0)
        base[..., 1] = 120 + 40 * np.cos(xx / 23.0)
        base[..., 2] = 90 + 30 * np.sin((xx + yy) / 29.0)
        marker = np.zeros((h, w, 3), np.uint8)
        marker[40:70, 50:90, 0] = 255  # red blotch = invalid
        out = apply_laplace(base, marker, red_threshold=220)
        invalid = np.zeros((h, w), bool)
        invalid[40:70, 50:90] = True
        # filled region is smooth: interior Laplacian ~ 0
        lap = (
            np.roll(out, 1, 0) + np.roll(out, -1, 0)
            + np.roll(out, 1, 1) + np.roll(out, -1, 1) - 4 * out
        )
        interior = invalid.copy()
        interior[0, :] = interior[-1, :] = interior[:, 0] = interior[:, -1] = False
        assert np.abs(lap[interior]).max() < 1e-4
        np.testing.assert_array_equal(out[~invalid], base[~invalid])
