"""Detection-pipeline benchmark (BASELINE config #3/#5 analog): full
cloud+shadow detection on the reference Sentinel-2 test scene.

Not driver-run (bench.py at the repo root is the headline metric); this
script documents end-to-end detection latency. Usage:

    python benchmarks/bench_detect.py [scene_dir]
"""

import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import tempfile
import time
from pathlib import Path

REF_SCENE = Path("/root/reference/test_data/2019-05-22")


def main():
    from satellite_approximation_tpu.models.detection.pipeline import (
        CloudParams,
        detect,
        get_diagonal_distance,
    )
    from satellite_approximation_tpu.utils.geotiff import GeoTIFF

    src = Path(sys.argv[1]) if len(sys.argv) > 1 else REF_SCENE
    work = Path(tempfile.mkdtemp()) / "scene"
    work.mkdir()
    for f in src.glob("*.tif"):
        (work / f.name).symlink_to(f)

    params = CloudParams.from_root(work)
    t = GeoTIFF.open(params.nir_path)
    diag = get_diagonal_distance(t.west(), t.south(), t.east(), t.north())

    t0 = time.perf_counter()
    status = detect(params, diag, use_cache=False)
    dt = time.perf_counter() - t0
    n_pix = t.width * t.height
    print(
        json.dumps(
            {
                "metric": "detect_e2e_latency",
                "value": round(dt, 2),
                "unit": "s",
                "pixels": n_pix,
                "mpix_per_s": round(n_pix / dt / 1e6, 3),
                "percent_clouds": status.percent_clouds,
                "percent_shadows": status.percent_shadows,
                "percent_invalid": status.percent_invalid,
            }
        )
    )
    shutil.rmtree(work.parent, ignore_errors=True)


if __name__ == "__main__":
    main()
