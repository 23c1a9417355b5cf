"""Prefetching raster loader for multi-date pipelines.

The reference walks date folders strictly sequentially, decoding every TIFF
on the critical path (automatic_detection.cpp:286-324). Here a thread pool
decodes the next dates' rasters while the accelerator works on the current
one — PIL's zlib decode releases the GIL, so decode genuinely overlaps both
compute and the host-side pipeline stages.
"""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path
from typing import Iterator

import numpy as np

from .filesystem import multispectral_folders
from .geotiff import GeoTIFF

DETECTION_RASTERS = (
    "B08", "CLP", "CLD", "SCL",
    "sunZenithAngles", "sunAzimuthAngles", "viewZenithMean", "viewAzimuthMean",
)


def load_detection_inputs(folder: Path | str, names=DETECTION_RASTERS) -> dict[str, np.ndarray]:
    """All rasters of one date folder, decoded in parallel."""
    folder = Path(folder)
    with cf.ThreadPoolExecutor(max_workers=len(names)) as pool:
        futures = {
            name: pool.submit(lambda p: GeoTIFF.open(p).read(), folder / f"{name}.tif")
            for name in names
        }
        return {name: fut.result() for name, fut in futures.items()}


class FolderPrefetcher:
    """Iterate date folders with the next ``prefetch`` folders decoding in
    the background."""

    def __init__(self, base: Path | str, names=DETECTION_RASTERS, prefetch: int = 2):
        self.folders = multispectral_folders(base)
        self.names = names
        self.prefetch = max(prefetch, 1)

    def __len__(self) -> int:
        return len(self.folders)

    def __iter__(self) -> Iterator[tuple[Path, dict[str, np.ndarray]]]:
        if not self.folders:
            return
        with cf.ThreadPoolExecutor(max_workers=self.prefetch) as pool:
            pending = {}
            for folder in self.folders[: self.prefetch]:
                pending[folder] = pool.submit(load_detection_inputs, folder, self.names)
            for k, folder in enumerate(self.folders):
                nxt = k + self.prefetch
                if nxt < len(self.folders):
                    pending[self.folders[nxt]] = pool.submit(
                        load_detection_inputs, self.folders[nxt], self.names
                    )
                yield folder, pending.pop(folder).result()
