"""Pure-stdlib PCM WAV writer/parser (RIFF/WAVE, fully public).

Layout: 'RIFF' <size> 'WAVE', an 'fmt ' chunk (PCM=1, channels,
sample rate, byte rate, block align, bits per sample) and a 'data'
chunk of little-endian samples. This module handles the mono 16-bit
PCM subset — enough to make the multimodal audio path run on REAL
sample bytes (operators/multimodal.py::wav_decode_stats) with the
same writer-vs-independent-oracle proof as the BMP image path.
Chunks other than 'fmt '/'data' (e.g. LIST metadata) are skipped per
the RIFF contract."""

from __future__ import annotations

import struct


def write_wav_bytes(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM. ``samples`` are ints in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def parse_wav_bytes(data: bytes) -> tuple[int, list[int]]:
    """Returns (sample_rate, samples) for mono 16-bit PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate: int | None = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"only mono 16-bit PCM supported "
                    f"(got fmt={audio_fmt} ch={channels} bits={bits})"
                )
        elif cid == b"data":
            samples = list(struct.unpack(f"<{size // 2}h", body[: size - size % 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples
