"""Probe: integer-shift ranges of the matching affine maps at tile scale.

The device sweep's per-pixel cost is the irregular gather
``cmap[qj, qi]`` (matching.py _bucket_sweep). If the affine map is a big
translation plus a TINY linear deviation, then over a window the shifts
``qi - px`` and ``qj - py`` each span only a few integers, and the gather
decomposes exactly into one dynamic_slice at the translated anchor plus a
handful of statically-shifted select passes (pure VPU work). This probe
measures those spans on realistic full-tile geometry: the same angle
field, diagonal, and view/sun distances the full-tile bench uses, with
synthetic clouds of every bucket size.

Run: python benchmarks/x_affine_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from satellite_approximation_tpu.config import DEFAULT_DETECTION
from satellite_approximation_tpu.models.detection.matching import (
    _cast_transforms,
    height_sweep,
)
from satellite_approximation_tpu.models.detection.pipeline import (
    get_diagonal_distance,
)
from satellite_approximation_tpu.ops import geometry
from satellite_approximation_tpu.models.detection.cloud_mask import CloudObject
from satellite_approximation_tpu.ops.components import Region


def main():
    n = 10980
    diag = get_diagonal_distance(-114.0, 50.5, -112.5, 51.5)
    cfg = DEFAULT_DETECTION

    # sun/view LS points from a subsampled constant-gradient angle field
    # (the bench's synthesize() rasters); 1/10 resolution spans the same
    # world box, so the LS point lands within meters of the full-res one
    m = 1098
    gy, gx = np.ogrid[:m, :m]
    grad = (gy / m + gx / m).astype(np.float32)
    sun_pos = geometry.ls_point_equal_to_chunked(
        35.0 + 0.5 * grad, 145.0 + 0.5 * grad, (m, m), diag,
        cfg.distance_to_sun_km,
    )
    view_pos = geometry.ls_point_equal_to_chunked(
        5.0 + 0.2 * grad, 100.0 + 0.3 * grad, (m, m), diag,
        cfg.distance_to_view_km,
    )
    print("sun_pos ", sun_pos)
    print("view_pos", view_pos)

    heights = height_sweep(cfg.matching)
    clouds = []
    sizes = [8, 32, 128, 512, 1024, 2048, 4096]
    for k, s in enumerate(sizes):
        cx = 1000 + 137 * k
        cy = 2000 + 211 * k
        r = Region(
            id=k, row_min=cy, row_max=min(cy + s - 1, n - 1),
            col_min=cx, col_max=min(cx + s - 1, n - 1), area=s * s,
        )
        min_x, max_x = r.col_min, r.col_max
        min_y, max_y = n - 1 - r.row_max, n - 1 - r.row_min
        quad = geometry.Quad(
            p00=geometry.pixel_to_world((n, n), diag, min_x, min_y, 0.1, 0.1),
            p01=geometry.pixel_to_world((n, n), diag, max_x, min_y, 0.9, 0.1),
            p10=geometry.pixel_to_world((n, n), diag, max_x, max_y, 0.9, 0.9),
            p11=geometry.pixel_to_world((n, n), diag, min_x, max_y, 0.1, 0.9),
        )
        clouds.append(
            CloudObject(id=k, region=r, quad=quad, min_x=min_x, max_x=max_x,
                        min_y=min_y, max_y=max_y)
        )

    a2, delta, (mnx, mxx, mny, mxy), m_all = _cast_transforms(
        clouds, heights, (n, n), diag, sun_pos, view_pos
    )
    # shift-span of qx - px over the window: |a00-1|*(wb-1) + |a01|*(hb-1)
    wb = (mxx - mnx).astype(np.float64)
    hb = (mxy - mny).astype(np.float64)
    span_x = np.abs(a2[..., 0, 0] - 1.0) * wb + np.abs(a2[..., 0, 1]) * hb
    span_y = np.abs(a2[..., 1, 0]) * wb + np.abs(a2[..., 1, 1] - 1.0) * hb
    # translation magnitude (the dynamic_slice anchor offset)
    tx = a2[..., 0, 0] * mnx + a2[..., 0, 1] * mny + delta[..., 0] - mnx
    ty = a2[..., 1, 0] * mnx + a2[..., 1, 1] * mny + delta[..., 1] - mny

    qs = [0, 120, 236, 352, 472]  # height indices: 0.2, 3.2, 6.1, 9.1, 12 km
    print(f"\n{'size':>6} {'h_km':>6} {'win_wb':>7} {'win_hb':>7} "
          f"{'span_x':>8} {'span_y':>8} {'|tx|':>9} {'|ty|':>9} "
          f"{'a00-1':>10} {'a01':>10} {'a10':>10} {'a11-1':>10}")
    for k, s in enumerate(sizes):
        for q in qs:
            print(
                f"{s:>6} {heights[q]:>6.2f} {wb[k, q] + 1:>7.0f} "
                f"{hb[k, q] + 1:>7.0f} {span_x[k, q]:>8.2f} "
                f"{span_y[k, q]:>8.2f} {abs(tx[k, q]):>9.1f} "
                f"{abs(ty[k, q]):>9.1f} {a2[k, q, 0, 0] - 1:>10.2e} "
                f"{a2[k, q, 0, 1]:>10.2e} {a2[k, q, 1, 0]:>10.2e} "
                f"{a2[k, q, 1, 1] - 1:>10.2e}"
            )
    # aggregate: worst span per bucket over ALL heights
    print("\nworst spans over all 473 heights:")
    for k, s in enumerate(sizes):
        print(
            f"  size {s:>5}: span_x max {span_x[k].max():6.2f}  "
            f"span_y max {span_y[k].max():6.2f}  "
            f"span_x@<=3km {span_x[k, heights <= 3.0].max():6.2f}  "
            f"span_y@<=3km {span_y[k, heights <= 3.0].max():6.2f}"
        )


if __name__ == "__main__":
    main()
