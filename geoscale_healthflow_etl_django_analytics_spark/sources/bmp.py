"""Pure-stdlib 24-bit uncompressed BMP writer/parser.

The Windows BMP layout is fully public: a 14-byte BITMAPFILEHEADER
('BM', file size, reserved, pixel-data offset) + 40-byte
BITMAPINFOHEADER (biSize=40, width, height, planes=1, bitcount=24,
compression=0=BI_RGB, ...), then the pixel array as BOTTOM-UP rows of
BGR byte triples, each row zero-padded to a 4-byte boundary.

This gives the multimodal pipeline one REAL image codec (no PIL /
imageio in this container, and none needed for this format): the
decode → resize → feature path in operators/multimodal.py runs on
actual pixel bytes instead of the md5 stub, and its registry query is
oracle-checked against an independent recomputation of the same
pixel function.
"""

from __future__ import annotations

import struct


def write_bmp_bytes(width: int, height: int, pixels: list) -> bytes:
    """``pixels`` = row-major TOP-DOWN list of (r, g, b) tuples,
    length width*height. Emits bottom-up BGR with row padding, per the
    format."""
    if len(pixels) != width * height:
        raise ValueError("pixels length must be width*height")
    row_size = (width * 3 + 3) & ~3
    data_size = row_size * height
    off = 14 + 40
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", off + data_size, 0, 0, off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR on disk
        out += row + pad
    return bytes(out)


def parse_bmp_bytes(data: bytes) -> tuple[int, int, list]:
    """Returns (width, height, row-major TOP-DOWN (r, g, b) tuples).
    Supports the subset the writer emits: BITMAPINFOHEADER, 24-bit,
    BI_RGB, positive (bottom-up) height."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (got {bpp}/{compression})")
    if height <= 0:
        raise ValueError("top-down (negative height) BMP not supported")
    row_size = (width * 3 + 3) & ~3
    pixels: list = [None] * (width * height)
    for y in range(height):
        base = off + (height - 1 - y) * row_size  # bottom-up -> top-down
        for x in range(width):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            pixels[y * width + x] = (r, g, b)
    return width, height, pixels
