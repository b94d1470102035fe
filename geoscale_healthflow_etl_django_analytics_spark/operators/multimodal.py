"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (training-data-pipeline op, per BASELINE.json north star).

Design for 100 TB of media:
- payloads are ``binary`` columns ride-along in parquet; metadata is
  a typed struct so pruning/filtering never touches bytes;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` (Arrow-batched, one Python worker per partition —
  the only sanctioned Python hot path in this engine);
- the actual codec step is STUBBED: the image/audio libraries are
  not in this container, so ``decode_media`` raises
  NotImplementedError unless ``fake=True``, which derives a
  deterministic pseudo-decode from the payload's md5 (the Spark-side
  plumbing — schema, batching, partitioning — is real and tested).

The fake feature vector doubles as an embedding source, feeding the
similarity operators (operators/similarity.py) end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "media_id long, kind string, byte_len int, width int, height int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, feature array<double>, feature_norm double"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build an opaque-binary media table from the documents corpus
    (payload = utf-8 bytes; kind derived deterministically). Stands in
    for an image/audio ingest: bytes + typed metadata columns."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).alias("byte_len"),
        # typed metadata struct: prunable without touching payload
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 120 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-decode: FEATURE_DIM doubles in [0,1) from
    a chained md5 HEX digest (4 hex chars -> one value k/65536, exact
    in double). The chain hashes the hex STRING, not raw bytes, so an
    ANSI-SQL oracle can replay it (md5(text), md5(md5(text)), ...) —
    the registry's mm_feature_extract query is value-hash checked
    against DuckDB on exactly this recurrence. Replace with a real
    codec + model when the libraries exist; the contract
    (bytes -> fixed-dim float vector) is what the pipeline depends on."""
    out: list[float] = []
    hex_digest = hashlib.md5(payload).hexdigest()
    while len(out) < FEATURE_DIM:
        for i in range(0, len(hex_digest) - 3, 4):
            out.append(int(hex_digest[i : i + 4], 16) / 65536.0)
            if len(out) == FEATURE_DIM:
                break
        hex_digest = hashlib.md5(hex_digest.encode("ascii")).hexdigest()
    return out


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas`` processes each partition as an iterator of pandas
    batches — constant memory per worker regardless of corpus size;
    partitioning (and thus parallelism) is inherited from the input.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/torchaudio/ffmpeg, not in "
            "this environment; pass fake=True for the deterministic stub"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def _norm(vec: list[float]) -> float:
            # sequential (not pairwise) sum + half-up round(6): the
            # exact double arithmetic an ANSI-SQL oracle reproduces
            # with a left-assoc sum-of-squares and round(x, 6).
            acc = 0.0
            for v in vec:
                acc += v * v
            return math.floor(math.sqrt(acc) * 1e6 + 0.5) / 1e6

        for pdf in batches:
            feats = [_fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feature_norm": [_norm(f) for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, FEATURES_SCHEMA
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning happens on METADATA only — the payload column
    is never read (verify via .explain: the parquet scan prunes it).
    The actual pixel resize would be one more mapInPandas over the
    rows where needs_resize."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        w.alias("width"),
        h.alias("height"),
        (w * scale).cast("int").alias("target_width"),
        (h * scale).cast("int").alias("target_height"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video rows: explode the frame index
    space from metadata (again payload-free)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
