"""Multi-date detection throughput (BASELINE config #5 at scale,
VERDICT r3 item 8): detect_in_folder over >= 4 date folders with the
FolderPrefetcher overlapping TIFF decode of the next dates against the
current date's compute (reference: a fully serial per-date loop,
automatic_detection.cpp:286-324).

Emits one JSON row: single-date latency (decode on the critical path,
like detect() called cold) vs the per-date amortized latency of the
batched run — the delta is the decode/compute overlap win.

    python benchmarks/bench_multidate.py [n_dates] [scene_dir]
"""

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_SCENE = Path("/root/reference/test_data/2019-05-22")


def make_dates(src: Path, root: Path, n: int) -> list[Path]:
    """n date folders with REAL (copied) TIFFs — symlinks would let the OS
    page cache alias one file across dates and understate decode cost."""
    out = []
    for k in range(n):
        d = root / f"2019-06-{k + 1:02d}"
        d.mkdir(parents=True)
        for f in src.glob("*.tif"):
            shutil.copyfile(f, d / f.name)
        (d / "B04.tif").touch()  # marks the folder MultiSpectral
        out.append(d)
    return out


def main():
    from satellite_approximation_tpu.models.detection.pipeline import (
        CloudParams,
        detect,
        detect_in_folder,
        get_diagonal_distance,
    )
    from satellite_approximation_tpu.utils.geotiff import GeoTIFF

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    src = Path(sys.argv[2]) if len(sys.argv) > 2 else REF_SCENE
    work = Path(tempfile.mkdtemp()) / "dates"
    dates = make_dates(src, work, n)

    t = GeoTIFF.open(dates[0] / "B08.tif")
    diag = get_diagonal_distance(t.west(), t.south(), t.east(), t.north())

    # warm compile caches + page cache on a throwaway copy so both timed
    # paths below start from the same warm-executable state
    warm = make_dates(src, Path(tempfile.mkdtemp()) / "w", 1)[0]
    detect(CloudParams.from_root(warm), diag, use_cache=False)
    shutil.rmtree(warm.parent.parent, ignore_errors=True)

    # single date, decode on the critical path (detect reads its own TIFFs)
    t0 = time.perf_counter()
    st = detect(CloudParams.from_root(dates[0]), diag, use_cache=False)
    single_s = time.perf_counter() - t0
    for p in dates[0].glob("*mask*.tif"):
        p.unlink()
    for p in dates[0].glob("*shadows*.tif"):
        p.unlink()

    # batched: FolderPrefetcher decodes date k+1..k+2 while date k computes
    t0 = time.perf_counter()
    results = detect_in_folder(work, diag, use_cache=False)
    batch_s = time.perf_counter() - t0
    assert len(results) == n, f"expected {n} results, got {len(results)}"

    amortized = batch_s / n
    print(
        json.dumps(
            {
                "metric": "multidate_detect_amortized",
                "value": round(amortized, 2),
                "unit": "s/date",
                "dates": n,
                "single_date_s": round(single_s, 2),
                "batch_total_s": round(batch_s, 2),
                "overlap_win_pct": round(100 * (1 - amortized / single_s), 1),
                "percent_clouds": st.percent_clouds,
            }
        )
    )
    shutil.rmtree(work.parent, ignore_errors=True)


if __name__ == "__main__":
    main()
