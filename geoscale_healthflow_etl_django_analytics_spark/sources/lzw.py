"""TIFF-variant LZW codec (TIFF 6.0 §13, Adobe 1992) in pure stdlib.

The TIFF flavor differs from plain LZW in three public, documented
ways this module implements exactly:

- codes are packed MSB-first into the byte stream;
- code 256 is ClearCode (table reset), 257 is EndOfInformation, and
  every strip MUST begin with a ClearCode;
- "early change": the code width bumps one code EARLIER than the
  table-size arithmetic alone would suggest — at table sizes 510,
  1022 and 2046 (9→10→11→12 bits) — and the table resets before a
  13-bit code would be needed (next code 4094 emits a ClearCode).

Used by sources/geotiff.py for Compression=5 strips; no external
imagery library involved (rasterio/PIL are absent from this
container and the format is fully specified)."""

from __future__ import annotations

_CLEAR = 256
_EOI = 257
_FIRST = 258


class _BitWriter:
    """MSB-first bit packer."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc = (self._acc << width) | code
        self._nbits += width
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def done(self) -> bytes:
        if self._nbits:
            self._out.append((self._acc << (8 - self._nbits)) & 0xFF)
        return bytes(self._out)


class _BitReader:
    """MSB-first bit unpacker."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._pos >= len(self._data):
                return _EOI  # ran off the end: treat as terminator
            self._acc = (self._acc << 8) | self._data[self._pos]
            self._pos += 1
            self._nbits += 8
        self._nbits -= width
        code = (self._acc >> self._nbits) & ((1 << width) - 1)
        self._acc &= (1 << self._nbits) - 1
        return code


def lzw_encode(data: bytes) -> bytes:
    """Compress ``data`` per TIFF 6.0 §13 (with early change)."""
    w = _BitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _FIRST
    width = 9
    w.write(_CLEAR, width)
    omega = b""
    for byte in data:
        k = bytes([byte])
        if omega + k in table:
            omega += k
            continue
        w.write(table[omega], width)
        table[omega + k] = next_code
        next_code += 1
        # early change: the ENCODER bumps width when the next code to
        # be assigned is 511/1023/2047 (one before the power of two)
        if next_code in (511, 1023, 2047):
            width += 1
        omega = k
        if next_code >= 4094:  # 12-bit table nearly full: reset
            w.write(table[omega], width)
            w.write(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _FIRST
            width = 9
            omega = b""
    if omega:
        w.write(table[omega], width)
    w.write(_EOI, width)
    return w.done()


def lzw_decode(data: bytes) -> bytes:
    """Decompress a TIFF 6.0 §13 LZW stream (early-change widths)."""
    r = _BitReader(data)
    out = bytearray()
    table: list[bytes] = []
    width = 9
    old: bytes | None = None

    def reset() -> None:
        nonlocal table, width, old
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        old = None

    reset()
    while True:
        code = r.read(width)
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            continue
        if old is None:
            # first code after a clear: a literal by construction
            if code >= len(table):
                raise ValueError("corrupt LZW stream (bad initial code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            # the KwKwK case: code refers to the entry being built
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        old = entry
        # early change mirror: width bumps when the next entry to be
        # ADDED would be 511/1023/2047
        if len(table) in (510, 1022, 2046):
            width += 1
    return bytes(out)
