"""Minimal multi-band TIFF codec (no GDAL, no tifffile).

The reference's ``GeoTiffWriter`` has a multi-band variant used by
``poisson_main`` to write one 5-band GeoTIFF
(/root/reference/lib/utils/include/utils/geotiff.h:98-195,
/root/reference/executables/poisson-main.cpp:66-71). PIL cannot encode
arbitrary-band float TIFFs, so this module writes classic little-endian
baseline TIFF by hand: one IFD, SamplesPerPixel=C, PlanarConfiguration=2
(band-sequential, one strip per band), uncompressed, with GeoTIFF tags
copied from a template. A matching reader parses these files (and baseline
strip-organized TIFFs generally) for roundtrips where PIL gives up.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

# TIFF tag ids
IMAGE_WIDTH = 256
IMAGE_LENGTH = 257
BITS_PER_SAMPLE = 258
COMPRESSION = 259
PHOTOMETRIC = 262
STRIP_OFFSETS = 273
SAMPLES_PER_PIXEL = 277
ROWS_PER_STRIP = 278
STRIP_BYTE_COUNTS = 279
PLANAR_CONFIG = 284
SAMPLE_FORMAT = 339

# TIFF field types
T_BYTE, T_ASCII, T_SHORT, T_LONG, T_RATIONAL = 1, 2, 3, 4, 5
T_SBYTE, T_UNDEF, T_SSHORT, T_SLONG, T_SRATIONAL, T_FLOAT, T_DOUBLE = (
    6, 7, 8, 9, 10, 11, 12,
)

_TYPE_SIZE = {
    T_BYTE: 1, T_ASCII: 1, T_SHORT: 2, T_LONG: 4, T_RATIONAL: 8,
    T_SBYTE: 1, T_UNDEF: 1, T_SSHORT: 2, T_SLONG: 4, T_SRATIONAL: 8,
    T_FLOAT: 4, T_DOUBLE: 8,
}
_TYPE_FMT = {
    T_BYTE: "B", T_SHORT: "H", T_LONG: "I", T_SBYTE: "b",
    T_SSHORT: "h", T_SLONG: "i", T_FLOAT: "f", T_DOUBLE: "d",
}

# numpy dtype -> (bits, sample_format)
_DTYPE_INFO = {
    np.dtype(np.uint8): (8, 1),
    np.dtype(np.uint16): (16, 1),
    np.dtype(np.uint32): (32, 1),
    np.dtype(np.int16): (16, 2),
    np.dtype(np.int32): (32, 2),
    np.dtype(np.float32): (32, 3),
    np.dtype(np.float64): (64, 3),
}
_INFO_DTYPE = {v: k for k, v in _DTYPE_INFO.items()}


def _encode_value(ftype: int, values) -> bytes:
    if ftype == T_ASCII:
        if isinstance(values, bytes):
            data = values
        else:
            data = str(values).encode("ascii", "replace")
        if not data.endswith(b"\0"):
            data += b"\0"
        return data
    fmt = _TYPE_FMT[ftype]
    if not isinstance(values, (tuple, list, np.ndarray)):
        values = (values,)
    return struct.pack(f"<{len(values)}{fmt}", *values)


def write_multiband_tiff(
    values: np.ndarray,
    path: Path | str,
    extra_tags: list[tuple[int, int, object]] | None = None,
) -> None:
    """Write (C, H, W) or (H, W) ``values`` as one planar multi-band TIFF.

    extra_tags: list of (tag_id, tiff_type, value) — e.g. GeoTIFF tags
    pulled from a template via :func:`geo_tags_from_pil`.
    """
    values = np.asarray(values)
    if values.ndim == 2:
        values = values[None]
    if values.ndim != 3:
        raise ValueError(f"expected (C, H, W) array, got shape {values.shape}")
    dt = values.dtype
    if dt not in _DTYPE_INFO:
        raise ValueError(f"unsupported dtype {dt}")
    bits, sfmt = _DTYPE_INFO[dt]
    c, h, w = values.shape
    band_bytes = h * w * (bits // 8)

    entries: list[tuple[int, int, bytes]] = [
        (IMAGE_WIDTH, T_LONG, _encode_value(T_LONG, w)),
        (IMAGE_LENGTH, T_LONG, _encode_value(T_LONG, h)),
        (BITS_PER_SAMPLE, T_SHORT, _encode_value(T_SHORT, (bits,) * c)),
        (COMPRESSION, T_SHORT, _encode_value(T_SHORT, 1)),
        (PHOTOMETRIC, T_SHORT, _encode_value(T_SHORT, 1)),
        (SAMPLES_PER_PIXEL, T_SHORT, _encode_value(T_SHORT, c)),
        (ROWS_PER_STRIP, T_LONG, _encode_value(T_LONG, h)),
        (STRIP_BYTE_COUNTS, T_LONG, _encode_value(T_LONG, (band_bytes,) * c)),
        (PLANAR_CONFIG, T_SHORT, _encode_value(T_SHORT, 2)),
        (SAMPLE_FORMAT, T_SHORT, _encode_value(T_SHORT, (sfmt,) * c)),
    ]
    for tag, ftype, val in extra_tags or ():
        entries.append((tag, ftype, _encode_value(ftype, val)))

    # STRIP_OFFSETS is resolved after layout; reserve its slot now.
    n_entries = len(entries) + 1
    ifd_offset = 8
    ifd_size = 2 + n_entries * 12 + 4
    overflow_offset = ifd_offset + ifd_size

    # Lay out overflow (>4 byte) payloads, then pixel data.
    payload_offsets: dict[int, int] = {}
    overflow = bytearray()
    all_entries = entries + [
        (STRIP_OFFSETS, T_LONG, _encode_value(T_LONG, (0,) * c))
    ]
    for tag, ftype, data in all_entries:
        if len(data) > 4:
            if len(overflow) % 2:
                overflow += b"\0"
            payload_offsets[tag] = overflow_offset + len(overflow)
            overflow += data
    data_offset = overflow_offset + len(overflow)
    if data_offset % 2:
        data_offset += 1
    strip_offsets = tuple(data_offset + i * band_bytes for i in range(c))

    # Patch the strip-offsets payload now that the layout is known. An
    # inline (<=4 byte, i.e. single-band) payload is patched in the entry
    # list instead of the overflow area.
    so_data = _encode_value(T_LONG, strip_offsets)
    if len(so_data) > 4:
        pos = payload_offsets[STRIP_OFFSETS] - overflow_offset
        overflow[pos : pos + len(so_data)] = so_data
    else:
        all_entries[-1] = (STRIP_OFFSETS, T_LONG, so_data)

    def entry_bytes(tag: int, ftype: int, data: bytes) -> bytes:
        count = (
            len(data)
            if ftype in (T_ASCII, T_BYTE, T_SBYTE, T_UNDEF)
            else len(data) // _TYPE_SIZE[ftype]
        )
        if len(data) <= 4:
            return struct.pack("<HHI4s", tag, ftype, count, data.ljust(4, b"\0"))
        return struct.pack("<HHII", tag, ftype, count, payload_offsets[tag])

    full = sorted(all_entries, key=lambda e: e[0])
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", n_entries)
    for tag, ftype, data in full:
        out += entry_bytes(tag, ftype, data)
    out += struct.pack("<I", 0)  # no next IFD
    out += overflow
    out += b"\0" * (data_offset - overflow_offset - len(overflow))
    arr = values if dt.byteorder in ("=", "|", "<") else values.astype(dt.newbyteorder("<"))
    out += np.ascontiguousarray(arr).tobytes()

    Path(path).write_bytes(bytes(out))


def _read_ifd_value(buf: bytes, ftype: int, count: int, raw: bytes, little: bool):
    bo = "<" if little else ">"
    size = _TYPE_SIZE[ftype] * count
    if size <= 4:
        data = raw[:size]
    else:
        (off,) = struct.unpack(f"{bo}I", raw)
        data = buf[off : off + size]
    if ftype == T_ASCII:
        return data.rstrip(b"\0").decode("ascii", "replace")
    if ftype in (T_RATIONAL, T_SRATIONAL):
        f = "I" if ftype == T_RATIONAL else "i"
        nums = struct.unpack(f"{bo}{2 * count}{f}", data)
        return tuple(nums[i] / nums[i + 1] for i in range(0, len(nums), 2))
    fmt = _TYPE_FMT.get(ftype)
    if fmt is None:
        return data
    vals = struct.unpack(f"{bo}{count}{fmt}", data)
    return vals[0] if count == 1 else vals


def read_multiband_tiff(path: Path | str) -> tuple[np.ndarray, dict]:
    """Read a baseline strip-organized uncompressed TIFF -> ((C,H,W), tags).

    Handles both planar configurations and multi-strip files; enough for
    everything :func:`write_multiband_tiff` produces plus typical
    GDAL-written uncompressed rasters.
    """
    buf = Path(path).read_bytes()
    order, magic, ifd_off = struct.unpack("<2sHI", buf[:8])
    little = order == b"II"
    if not little:
        _, magic, ifd_off = struct.unpack(">2sHI", buf[:8])
    if magic != 42:
        raise ValueError(f"{path}: not a classic TIFF")
    bo = "<" if little else ">"

    (n,) = struct.unpack_from(f"{bo}H", buf, ifd_off)
    tags: dict[int, object] = {}
    for i in range(n):
        tag, ftype, count = struct.unpack_from(f"{bo}HHI", buf, ifd_off + 2 + i * 12)
        raw = buf[ifd_off + 2 + i * 12 + 8 : ifd_off + 2 + i * 12 + 12]
        if ftype in _TYPE_SIZE:
            tags[tag] = _read_ifd_value(buf, ftype, count, raw, little)

    w = int(tags[IMAGE_WIDTH])
    h = int(tags[IMAGE_LENGTH])
    spp = int(tags.get(SAMPLES_PER_PIXEL, 1))
    if int(tags.get(COMPRESSION, 1)) != 1:
        raise ValueError(f"{path}: only uncompressed TIFF supported here")
    bps = tags.get(BITS_PER_SAMPLE, 8)
    bits = int(bps[0] if isinstance(bps, tuple) else bps)
    sf = tags.get(SAMPLE_FORMAT, 1)
    sfmt = int(sf[0] if isinstance(sf, tuple) else sf)
    dt = _INFO_DTYPE.get((bits, sfmt))
    if dt is None:
        raise ValueError(f"{path}: unsupported sample format ({bits} bits, fmt {sfmt})")
    dt = dt.newbyteorder("<" if little else ">")

    offs = tags[STRIP_OFFSETS]
    cnts = tags[STRIP_BYTE_COUNTS]
    offs = (offs,) if not isinstance(offs, tuple) else offs
    cnts = (cnts,) if not isinstance(cnts, tuple) else cnts
    data = b"".join(buf[o : o + c] for o, c in zip(offs, cnts))
    flat = np.frombuffer(data, dtype=dt)
    planar = int(tags.get(PLANAR_CONFIG, 1)) == 2
    if planar:
        arr = flat.reshape(spp, h, w)
    else:
        arr = np.moveaxis(flat.reshape(h, w, spp), -1, 0)
    return arr.astype(dt.newbyteorder("=")), tags
