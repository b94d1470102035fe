"""S4 — pure-stdlib uncompressed-GeoTIFF reader/writer.

The TIFF 6.0 binary layout is public (Adobe, 1992): an 8-byte header
(byte order ``II``/``MM``, magic 42, offset of the first IFD), then
IFDs of 12-byte tag entries; strip-organized image data is located by
the StripOffsets/StripByteCounts tags. GeoTIFF (OGC 19-008r4) adds
georeferencing via ModelPixelScaleTag (33550) + ModelTiepointTag
(33922), which define the affine from (col,row) raster space to model
space. This module handles exactly the subset the reference's slope
upload needs — single-band strip-organized rasters, uncompressed,
deflate-compressed (Compression=8/32946, strip-wise zlib inflate) or
LZW-compressed (Compression=5, TIFF 6.0 §13 via sources/lzw.py) —
replacing the ``rasterio.open`` + ``rasterio.features.shapes`` step of
``SlopeGeoJsonUploadView.py:195-321`` (rasterio is absent from this
container and unneeded: every format involved is fully public).

Polygonize stance: the reference merges connected same-value pixel
regions into polygons. This module emits one square polygon per pixel
(the maximal-granularity polygonize — every downstream consumer of
(geometry, value) rows composes identically); region merging is a
connected-components pass over the pixel adjacency graph
(operators/dedup.py::connected_components) when cluster ids are
needed, but boundary tracing of merged rings is out of scope.
"""

from __future__ import annotations

import struct
import zlib

from .lzw import lzw_decode, lzw_encode

# TIFF tag ids (TIFF 6.0 §8 / OGC GeoTIFF)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PREDICTOR = 317
_T_SAMPLE_FORMAT = 339
_T_MODEL_PIXEL_SCALE = 33550
_T_MODEL_TIEPOINT = 33922

# field type -> (struct code, byte size); TIFF 6.0 §2 type codes
_TYPES = {
    1: ("B", 1),   # BYTE
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}


def _read_entries(data: bytes, bo: str) -> dict[int, list]:
    """Tag id -> list of values from the first IFD."""
    ifd_off = struct.unpack_from(f"{bo}I", data, 4)[0]
    n = struct.unpack_from(f"{bo}H", data, ifd_off)[0]
    out: dict[int, list] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(f"{bo}HHI", data, base)
        if ftype not in _TYPES:
            continue
        code, size = _TYPES[ftype]
        total = size * count
        off = base + 8 if total <= 4 else struct.unpack_from(f"{bo}I", data, base + 8)[0]
        out[tag] = list(struct.unpack_from(f"{bo}{count}{code}", data, off))
    return out


def parse_geotiff_bytes(data: bytes) -> dict:
    """Decode a single-band strip-organized GeoTIFF (uncompressed or
    deflate).

    Returns {width, height, values (row-major list of float),
    origin_x, origin_y, px_size_x, px_size_y} where the origin is the
    model-space coordinate of the raster's top-left CORNER and
    py_size_y is negative for north-up rasters (the common case) —
    the standard GeoTIFF affine restricted to axis-aligned grids.
    """
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    if struct.unpack_from(f"{bo}H", data, 2)[0] != 42:
        raise ValueError("not a TIFF (bad magic)")
    tags = _read_entries(data, bo)
    compression = tags.get(_T_COMPRESSION, [1])[0]
    # 1 = none; 5 = LZW (TIFF 6.0 §13, sources/lzw.py); 7 = new-style
    # JPEG (TIFF TechNote 2; each strip a standalone baseline stream,
    # sources/jpeg.py); 8 = Adobe deflate (zlib) — 32946 is the older
    # duplicate code for the same zlib stream. All strip-wise.
    if compression not in (1, 5, 7, 8, 32946):
        raise ValueError(
            f"unsupported TIFF compression {compression}; this reader "
            "handles none (1), LZW (5), JPEG (7) and deflate (8/32946)"
        )
    if tags.get(_T_PREDICTOR, [1])[0] != 1:
        raise ValueError(
            "TIFF Predictor=2 (horizontal differencing) not supported"
        )
    if tags.get(_T_SAMPLES_PER_PIXEL, [1])[0] != 1:
        raise ValueError("only single-band rasters supported")
    width = tags[_T_WIDTH][0]
    height = tags[_T_LENGTH][0]
    bits = tags.get(_T_BITS, [8])[0]
    fmt = tags.get(_T_SAMPLE_FORMAT, [1])[0]  # 1=uint, 2=int, 3=float
    code = {
        (1, 8): "B", (1, 16): "H", (1, 32): "I",
        (2, 8): "b", (2, 16): "h", (2, 32): "i",
        (3, 32): "f", (3, 64): "d",
    }.get((fmt, bits))
    if code is None:
        raise ValueError(f"unsupported sample format/bits: {fmt}/{bits}")
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [height])[0]
    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags[_T_STRIP_COUNTS]
    values: list[float] = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        n = n_rows * width
        strip = data[off : off + cnt]
        if compression == 7:
            from .jpeg import decode_gray

            arr = decode_gray(strip)
            if arr.shape != (n_rows, width):
                raise ValueError(
                    f"strip {si}: JPEG decoded {arr.shape}, "
                    f"expected {(n_rows, width)}"
                )
            values.extend(int(v) for v in arr.flatten())
            continue
        if compression == 5:
            strip = lzw_decode(strip)
        elif compression != 1:
            strip = zlib.decompress(strip)
        if len(strip) < n * struct.calcsize(code):
            raise ValueError(
                f"strip {si}: {len(strip)} bytes decoded, "
                f"{n * struct.calcsize(code)} required"
            )
        values.extend(struct.unpack_from(f"{bo}{n}{code}", strip, 0))
    scale = tags.get(_T_MODEL_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(_T_MODEL_TIEPOINT, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    # tiepoint maps raster (I,J) -> model (X,Y); top-left corner case
    origin_x = tie[3] - tie[0] * scale[0]
    origin_y = tie[4] + tie[1] * scale[1]
    return {
        "width": width,
        "height": height,
        "values": [float(v) for v in values],
        "origin_x": origin_x,
        "origin_y": origin_y,
        "px_size_x": scale[0],
        "px_size_y": -scale[1],
    }


def write_geotiff_bytes(
    width: int,
    height: int,
    values: list[float],
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    px_size: float = 1.0,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> bytes:
    """Inverse of :func:`parse_geotiff_bytes` — little-endian,
    single-band float64, north-up (origin = top-left corner, rows run
    south). ``compression='deflate'`` emits Compression=8 with each
    strip zlib-compressed independently (TIFF TechNote 2);
    ``rows_per_strip`` splits the raster into multiple strips so the
    round-trip exercises strip-wise inflate. Used to round-trip the
    parser and to generate deterministic raster fixtures for the
    registered S4 end-to-end queries."""
    if len(values) != width * height:
        raise ValueError("values length must be width*height")
    if compression not in ("none", "deflate", "lzw", "jpeg"):
        raise ValueError(
            "compression must be 'none', 'deflate', 'lzw' or 'jpeg'"
        )
    if compression == "jpeg":
        bad = [v for v in values if not float(v).is_integer() or not 0 <= v <= 255]
        if bad:
            raise ValueError(
                "JPEG strips carry 8-bit samples; values must be "
                f"integers in [0, 255] (got e.g. {bad[0]!r})"
            )
    rps = rows_per_strip or height
    strips: list[bytes] = []
    for r0 in range(0, height, rps):
        n_rows = min(rps, height - r0)
        chunk = values[r0 * width : (r0 + n_rows) * width]
        if compression == "jpeg":
            import numpy as np

            from .jpeg import encode_gray

            raw = encode_gray(
                np.array(chunk, dtype=np.uint8).reshape(n_rows, width),
                quant=1,
            )
        else:
            raw = struct.pack(f"<{len(chunk)}d", *chunk)
            if compression == "deflate":
                raw = zlib.compress(raw)
            elif compression == "lzw":
                raw = lzw_encode(raw)
        strips.append(raw)
    n_strips = len(strips)
    comp_code = {"none": 1, "deflate": 8, "lzw": 5, "jpeg": 7}[compression]
    bits = 8 if compression == "jpeg" else 64
    sample_fmt = 1 if compression == "jpeg" else 3
    entries = [
        (_T_WIDTH, 4, 1, width),
        (_T_LENGTH, 4, 1, height),
        (_T_BITS, 3, 1, bits),
        (_T_COMPRESSION, 3, 1, comp_code),
        (_T_PHOTOMETRIC, 3, 1, 1),
        (_T_STRIP_OFFSETS, 4, n_strips, None),   # patched below
        (_T_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_T_ROWS_PER_STRIP, 4, 1, rps),
        (_T_STRIP_COUNTS, 4, n_strips, None),    # patched below
        (_T_SAMPLE_FORMAT, 3, 1, sample_fmt),
        (_T_MODEL_PIXEL_SCALE, 12, 3, None),     # external
        (_T_MODEL_TIEPOINT, 12, 6, None),        # external
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    scale_off = ifd_off + ifd_size
    tie_off = scale_off + 3 * 8
    # multi-valued offset/count arrays don't fit a tag's 4 inline
    # bytes; park them after the tiepoint block
    ext_off = tie_off + 6 * 8
    offsets_arr_off = ext_off
    counts_arr_off = ext_off + (4 * n_strips if n_strips > 1 else 0)
    data_off = counts_arr_off + (4 * n_strips if n_strips > 1 else 0)
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, val in entries:
        if tag == _T_STRIP_OFFSETS:
            val = strip_offsets[0] if n_strips == 1 else offsets_arr_off
        elif tag == _T_STRIP_COUNTS:
            val = len(strips[0]) if n_strips == 1 else counts_arr_off
        elif tag == _T_MODEL_PIXEL_SCALE:
            val = scale_off
        elif tag == _T_MODEL_TIEPOINT:
            val = tie_off
        out += struct.pack("<HHII", tag, ftype, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    out += struct.pack("<3d", px_size, px_size, 0.0)
    # tiepoint: raster (0,0,0) pins to model (origin_x, origin_y, 0)
    out += struct.pack("<6d", 0.0, 0.0, 0.0, origin_x, origin_y, 0.0)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
        out += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)
