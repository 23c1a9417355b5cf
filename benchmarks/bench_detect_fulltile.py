"""Full-tile detection benchmark: cloud+shadow detection at 10980x10980.

The BASELINE north star is detect+fill of a FULL Sentinel-2 L2A tile; the
reference was only ever run on a 1284x1697 sub-scene (its single global
bbox sparse solve and O(diameter)-sweep pit-fill would not scale). This
exercises every detection stage at tile scale:

    blur sigma=4, 31x31 ellipse dilate + close (MXU convs)  @ 120 Mpix
    hierarchical pit-fill                                   @ 120 Mpix
    native flood partition                                  @ 120 Mpix
    ray-cast matching over every cloud >= 3 px
    alpha/beta/probability refinement + final mask

Scene synthesis: blobby cloud field (CLP/CLD/SCL consistent), NIR with
dark shadow copies of the clouds displaced along the sun azimuth (so the
height sweep finds real matches), constant-gradient angle rasters.

    python benchmarks/bench_detect_fulltile.py [size]
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def synthesize(n: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    # blobby cloud probability: max of local Gaussian bumps, each computed
    # only inside its ~4-sigma window (a full-frame pass per blob would be
    # 274 x 120 Mpix of host numpy at tile scale)
    base = np.zeros((n, n), np.float32)
    n_blobs = max(60, n // 40)
    for _ in range(n_blobs):
        cy, cx = rng.integers(0, n, 2)
        ry = int(rng.integers(n // 400 + 4, n // 40 + 8))
        rx = int(rng.integers(n // 400 + 4, n // 40 + 8))
        y0, y1 = max(cy - 4 * ry, 0), min(cy + 4 * ry + 1, n)
        x0, x1 = max(cx - 4 * rx, 0), min(cx + 4 * rx + 1, n)
        yy = np.arange(y0, y1)[:, None]
        xx = np.arange(x0, x1)[None, :]
        d2 = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        np.maximum(
            base[y0:y1, x0:x1],
            np.exp(-0.5 * d2.astype(np.float32)),
            out=base[y0:y1, x0:x1],
        )
    clp = np.clip(base * 255 * 1.2, 0, 255).astype(np.uint8)
    cld = np.clip(base * 100 * 1.1, 0, 100).astype(np.uint8)
    cloud = base > 0.55

    scl = np.full((n, n), 4, np.uint8)  # vegetation
    scl[base > 0.75] = 9  # cloud high probability
    scl[(base > 0.65) & (base <= 0.75)] = 8  # cloud medium

    # shadows: clouds displaced north-west (sun from the south-east),
    # darkening the NIR
    dy, dx = -(n // 180), -(n // 240)
    shadow = np.zeros_like(cloud)
    src = cloud[max(-dy, 0) : n - max(dy, 0), max(-dx, 0) : n - max(dx, 0)]
    shadow[max(dy, 0) : n - max(-dy, 0), max(dx, 0) : n - max(-dx, 0)] = src
    # spatially correlated NIR like real 10 m imagery (white noise makes
    # every pixel a pit — adversarial and unrepresentative for pit fill)
    from satellite_approximation_tpu.ops.blur import gaussian_blur_host

    g = gaussian_blur_host(rng.standard_normal((n, n)).astype(np.float32), 3.0)
    g = g / max(float(g.std()), 1e-6)
    nir = (6000 + 1500 * g).clip(500, 10000)
    nir[shadow] *= 0.35
    nir = nir.astype(np.uint16)

    gy, gx = np.ogrid[:n, :n]
    grad = (gy / n + gx / n).astype(np.float32)
    inputs = {
        "CLP": clp,
        "CLD": cld,
        "SCL": scl,
        "B08": nir,
        "sunZenithAngles": 35.0 + 0.5 * grad,
        "sunAzimuthAngles": 145.0 + 0.5 * grad,
        "viewZenithMean": 5.0 + 0.2 * grad,
        "viewAzimuthMean": 100.0 + 0.3 * grad,
    }
    return inputs


def main():
    import argparse
    import dataclasses

    import satellite_approximation_tpu  # noqa: F401
    from satellite_approximation_tpu.config import DEFAULT_DETECTION
    from satellite_approximation_tpu.models.detection.pipeline import (
        CloudParams,
        detect,
        get_diagonal_distance,
    )
    from satellite_approximation_tpu.utils.geotiff import write_geotiff
    from satellite_approximation_tpu.utils.profiling import StageTimer

    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=10980)
    ap.add_argument(
        "--backend", default="auto", choices=("auto", "jax"),
        help="auto: measured big-scene routing (host-native stages on this "
        "tunnel host); jax: every stage on device, masks cross bit-packed",
    )
    args = ap.parse_args()
    n = args.size
    config = DEFAULT_DETECTION
    if args.backend == "jax":
        config = dataclasses.replace(
            config,
            refinement=dataclasses.replace(config.refinement, backend="jax"),
            matching=dataclasses.replace(config.matching, backend="jax"),
        )
    inputs = synthesize(n)

    work = Path(tempfile.mkdtemp()) / "tile"
    work.mkdir()
    # only B08 needs to exist on disk (mask writes copy its GeoTIFF tags)
    write_geotiff(
        inputs["B08"], work / "B08.tif",
        template_path="/root/reference/test_data/2019-05-22/B08.tif",
    )
    params = CloudParams.from_root(work)
    diag = get_diagonal_distance(-114.0, 50.5, -112.5, 51.5) * (n / 10980.0)

    rows = []
    for run in range(2):
        for p in (
            params.cloud_path(), params.shadow_potential_path(),
            params.object_based_shadow_path(), params.shadow_path(),
        ):
            p.unlink(missing_ok=True)
        timer = StageTimer()
        t0 = time.perf_counter()
        status = detect(
            params, diag, use_cache=False, timer=timer, inputs=inputs,
            config=config,
        )
        dt = time.perf_counter() - t0
        rows.append(
            {
                "metric": "detect_fulltile_latency",
                "backend": args.backend,
                "run": "cold" if run == 0 else "warm",
                "value": round(dt, 2),
                "unit": "s",
                "size": n,
                "mpix_per_s": round(n * n / dt / 1e6, 2),
                "percent_clouds": round(status.percent_clouds, 4),
                "percent_shadows": round(status.percent_shadows or 0.0, 4),
                # per-stage breakdown so the artifact shows where each
                # backend spends its time (device vs host routing); repeated
                # stage names (per-band loops) accumulate
                "stages_s": {
                    name: round(sum(t for n_, t in timer.stages if n_ == name), 2)
                    for name in dict.fromkeys(n_ for n_, _ in timer.stages)
                },
            }
        )
        print(json.dumps(rows[-1]), flush=True)
        print("# " + timer.report().replace("\n", "\n# "), file=sys.stderr, flush=True)
    shutil.rmtree(work.parent, ignore_errors=True)


if __name__ == "__main__":
    main()
