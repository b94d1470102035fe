"""Count-Min sketch on CROSS-ENGINE md5 buckets — the full-value-
oracle port of ``functions/sketches.py`` (VERDICT r9 next-round #2).

The original CMS hashes with JVM ``xxhash64``, which no other engine
reproduces: the sketch itself sat outside the DuckDB replay and the
registered query could only pin a probabilistic tolerance-1 error
bound — a gate that a legitimate sketch could flip with Markov-tail
probability under a regenerated corpus.  The HyperLogLog
(``functions/hll.py``) proved the fix pattern in r9: derive buckets
from md5 (bit-for-bit identical in Spark, DuckDB, Postgres, Trino)
and keep every reduction exact-integer, so registers, estimates and
bounds ALL replay and the correctness gate is a value hash, not a
bound check.

Bucket derivation: ONE md5 per token, its 32 hex chars cut into
``depth`` disjoint 8-hex slices — row ``i``'s bucket is
``int(hex[8i .. 8i+8), 16) & (width - 1)`` (independent uniform bits
per row from a single hash call, cheaper than ``depth`` full md5s).
DuckDB replay per row:
``('0x' || substr(md5(token), 1 + 8*i, 8))::BIGINT & (width-1)``.
``depth <= 4`` is therefore structural (4 x 8 = all 32 hex chars).

Everything else — the one map-side-combinable ``groupBy().count()``
over ``depth x width`` cells, the one-row packed ``map<long,long>``,
the min-over-rows point estimate, cell-wise-addition mergeability —
is the proven design of ``functions/sketches.py`` unchanged; see that
module for the Cormode & Muthukrishnan 2005 guarantees and the
100 TB streaming rationale.  The xxhash64 original stays for
pure-speed paths with no oracle (the streaming merge twin keeps it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048  # eps = e/width ~ 0.00133 -> overestimate <= 0.133% of N


def _bucket(token: Column, i: int, width: int) -> Column:
    """Row-i bucket: hex slice ``[8i, 8i+8)`` of the token's md5,
    masked to ``width`` (power of two so the modulo is a mask and the
    slice's 32 uniform bits stay unbiased)."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    if not 0 <= i < 4:
        raise ValueError(f"md5 has 4 disjoint 8-hex slices, got row {i}")
    return (
        F.conv(F.substring(F.md5(token), 1 + 8 * i, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(width - 1))
    )


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """ONE-row DataFrame ``(cms: map<long,long>, n_total: long)`` —
    the packed md5-bucket sketch over every row of ``tokens``.  Cell
    key is the flat address ``i * width + bucket``; ``n_total`` (the
    stream length N in the error bound) falls out of row 0's cells."""
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _bucket(F.col(token_col), i, width).alias("b"),
                )
                for i in range(depth)
            ]
        )
    )
    cells = (
        tokens.select(probes.alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
    )
    key = F.col("i").cast("long") * width + F.col("b").cast("long")
    return cells.agg(
        F.map_from_arrays(
            F.collect_list(key), F.collect_list("cnt")
        ).alias("cms"),
        F.sum(F.when(F.col("i") == 0, F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_total"),
    )


def cms_estimate(
    token: Column,
    cms: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> Column:
    """Point estimate: min over rows of the token's cell — the classic
    CM estimator; missing cells read 0 (a never-seen token estimates
    0, which is correct, not an underestimate)."""
    return F.least(
        *[
            F.coalesce(
                F.element_at(
                    cms,
                    F.lit(i * width).cast("long")
                    + _bucket(token, i, width).cast("long"),
                ),
                F.lit(0).cast("long"),
            )
            for i in range(depth)
        ]
    )
