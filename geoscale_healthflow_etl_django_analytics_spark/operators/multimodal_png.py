"""PNG leg of the multimodal decode path.

Own module rather than operators/multimodal.py so the BMP/WAV/JPEG
module's bytes stay untouched by this round's additions; shares its
output schema and rounding helper.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .multimodal import BMP_STATS_SCHEMA, _round6

def _png_pixel(x: int, y: int, mid: int) -> tuple:
    """Deterministic synthetic pixel for the PNG path — different
    coefficients than :func:`_bmp_pixel` so the two codec queries
    never share outputs; integer arithmetic an ANSI-SQL oracle
    replays verbatim (registry.py::mm_png_decode_stats)."""
    return (
        (x * 11 + y * 5 + mid) % 256,
        (x * 3 + y * 13 + 2 * mid) % 256,
        (x * 7 + y * 17 + 3 * mid) % 256,
    )


def media_png_corpus(ids: DataFrame) -> DataFrame:
    """One real 8-bit RGB PNG payload per input row: width = id%12+2,
    height = id%9+2, pixels from :func:`_png_pixel`.  The writer
    (sources/png.py) stores scanline y under filter y % 5, so every
    payload taller than 4 rows exercises ALL five PNG predictors —
    the decode below must reverse Sub/Up/Average/Paeth correctly or
    the oracle hash breaks."""
    from ..sources.png import write_png_bytes

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = mid % 12 + 2, mid % 9 + 2
                payloads.append(
                    write_png_bytes(
                        w,
                        h,
                        [
                            _png_pixel(x, y, mid)
                            for y in range(h)
                            for x in range(w)
                        ],
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    from .multimodal import _spread_ids

    return _spread_ids(ids).mapInPandas(
        _gen, "media_id long, payload binary"
    )


def png_decode_resize_stats(media: DataFrame, max_side: int = 8) -> DataFrame:
    """PNG twin of :func:`bmp_decode_resize_stats`: Arrow-batched
    inflate + unfilter (all five predictors) + CRC verify → numpy
    nearest-neighbor resize → channel means + the position-weighted
    fingerprint, independently recomputed by the oracle from the
    pixel function (it never parses PNG)."""
    import numpy as np

    from ..sources.png import parse_png_bytes

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = parse_png_bytes(bytes(payload))
                arr = np.array(px, dtype=np.int64).reshape(h, w, 3)
                ow, oh = min(w, max_side), min(h, max_side)
                xs = [i * w // ow for i in range(ow)]
                ys = [j * h // oh for j in range(oh)]
                out = arr[np.ix_(ys, xs)]
                n = ow * oh
                sums = out.sum(axis=(0, 1))
                ii = np.arange(ow).reshape(1, ow)
                jj = np.arange(oh).reshape(oh, 1)
                weight = 1 + ii + 2 * jj
                chan = out[:, :, 0] + 2 * out[:, :, 1] + 3 * out[:, :, 2]
                fp = int((chan * weight).sum())
                rows.append(
                    (
                        int(mid), w, h, ow, oh,
                        _round6(sums[0] / n),
                        _round6(sums[1] / n),
                        _round6(sums[2] / n),
                        fp,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "out_w", "out_h",
                    "mean_r", "mean_g", "mean_b", "fingerprint",
                ],
            )

    return media.mapInPandas(_stats, BMP_STATS_SCHEMA)
