"""Pure-stdlib 8-bit RGB PNG writer/parser (RFC 2083 / ISO 15948).

The PNG layout is fully public: an 8-byte signature, then chunks of
(length, 4-char type, data, CRC-32) — IHDR (width, height, bit depth,
color type, compression=0, filter=0, interlace), one or more IDAT
chunks holding the zlib-compressed FILTERED scanlines (each scanline
prefixed by a filter-type byte), and IEND.  zlib deflate and CRC-32
both come from the Python stdlib (``zlib``), so like the BMP/WAV/JPEG
codecs this needs nothing outside the container.

The scanline filters are the substance of a PNG decode: every row is
stored as a delta against its neighbors under one of five public
predictors (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).  The writer
here deliberately VARIES the filter per row (``row % 5``) so a parser
that mishandles any predictor — especially Paeth's tie-breaking order
— produces wrong pixels and breaks the independent oracle hash, the
same writer-vs-oracle proof discipline as the GeoTIFF/BMP paths.

Subset: bit depth 8, color type 2 (truechannel RGB), no interlace —
the shape a training-data pipeline overwhelmingly ingests; anything
else raises, and chunk CRCs are verified.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor, exactly as published (left, up, up-left;
    ties prefer a, then b)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(
    ftype: int, row: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (encode direction)."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        x = row[i]
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
    return bytes(out)


def _unfilter_row(
    ftype: int, row: bytearray, prev: bytes, bpp: int
) -> None:
    """Reverse filter ``ftype`` in place (decode direction)."""
    n = len(row)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unsupported filter type {ftype}")
        row[i] = (row[i] + pred) & 0xFF


def write_png_bytes(width: int, height: int, pixels: list) -> bytes:
    """``pixels`` = row-major TOP-DOWN (r, g, b) tuples, length
    width*height.  Each scanline is stored under filter ``y % 5`` so
    every predictor (incl. Paeth) appears in any image 5+ rows tall."""
    if len(pixels) != width * height:
        raise ValueError("pixels length must be width*height")
    bpp = 3
    raw_prev = bytes(width * bpp)
    stream = bytearray()
    for y in range(height):
        raw = bytes(
            v for x in range(width) for v in pixels[y * width + x]
        )
        ftype = y % 5
        stream += bytes((ftype,)) + _filter_row(ftype, raw, raw_prev, bpp)
        raw_prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _chunk(b"IEND", b"")
    )


def parse_png_bytes(data: bytes) -> tuple[int, int, list]:
    """Returns (width, height, row-major TOP-DOWN (r, g, b) tuples).
    Verifies the signature and every chunk CRC; supports the subset
    the writer emits (8-bit RGB, no interlace) and multiple IDATs."""
    # Error contract (ADVICE r9 #4): every malformed payload raises
    # ValueError — truncated chunks, out-of-order chunks and corrupt
    # deflate data included — so mapInPandas consumers see ONE typed
    # error instead of untyped struct.error/zlib.error surfacing from
    # stdlib internals.
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("chunk length exceeds buffer")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("bad IHDR length")
            width, height, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced supported "
                    f"(got depth={depth} color={color} interlace={inter})"
                )
        elif ctype == b"IDAT":
            if width is None:
                raise ValueError("IDAT before IHDR")
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT deflate stream: {e}") from e
    bpp = 3
    stride = width * bpp
    if len(stream) != height * (1 + stride):
        raise ValueError("decompressed length mismatch")
    pixels: list = [None] * (width * height)
    prev = bytes(stride)
    for y in range(height):
        base = y * (1 + stride)
        ftype = stream[base]
        row = bytearray(stream[base + 1 : base + 1 + stride])
        _unfilter_row(ftype, row, prev, bpp)
        for x in range(width):
            pixels[y * width + x] = (
                row[3 * x], row[3 * x + 1], row[3 * x + 2]
            )
        prev = bytes(row)
    return width, height, pixels
