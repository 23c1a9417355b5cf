"""Native (C++) runtime helpers, loaded via ctypes with pure-Python fallback.

Builds ``libsatnative.so`` from ``src/satnative.cpp`` on first use (g++ -O3);
if no toolchain is available every entry point falls back to the Python
implementation, so the framework never hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src" / "satnative.cpp"
_SO = _HERE / "libsatnative.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def get_lib():
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.hole_fill.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
        lib.flood_partition.restype = ctypes.c_int32
        lib.flood_partition.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.border_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def hole_fill(grid: np.ndarray, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Sequential inverse-distance hole fill (reference-exact update order).
    grid: (D, D) f32 indexed [j, i]; valid: (D, D) bool. Returns updated
    copies, or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = grid.shape[0]
    g = np.ascontiguousarray(grid, dtype=np.float32).copy()
    v = np.ascontiguousarray(valid, dtype=np.uint8).copy()
    lib.hole_fill(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(d),
    )
    return g, v.astype(bool)


def flood_partition(mask: np.ndarray, min_area: int) -> tuple[np.ndarray, int] | None:
    """BFS flood partition in reference scan order. mask: (H, W) bool.
    Returns (labels int32 with -1 background, n_regions), or None."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = m.shape
    labels = np.empty((h, w), dtype=np.int32)
    n = lib.flood_partition(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h),
        ctypes.c_int32(w),
        ctypes.c_int32(min_area),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels, int(n)


def border_mask(mask: np.ndarray) -> np.ndarray | None:
    """Region-border extraction (Functions::border semantics)."""
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = m.shape
    out = np.empty((h, w), dtype=np.uint8)
    lib.border_mask(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(h),
        ctypes.c_int32(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)
