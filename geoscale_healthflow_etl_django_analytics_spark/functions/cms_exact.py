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

Bucket derivation — and its cost discipline: ONE ``md5_int60`` per
token (one md5 + one hex parse, the HLL's exact per-row price), then
row ``i``'s bucket is the ``i``-th disjoint 11-bit slice
``(h >> (11 * i)) & (width - 1)`` — shifts and masks are free next
to the hash.  (A first cut evaluated four separate md5+conv chains
per token — common-subexpression elimination does not reach across
the probe-array elements — and measured 9.6x the xxhash tier at
x200; this form measures at the HLL's cost.)  DuckDB replay per row:
``(('0x' || substr(md5(token), 1, 15))::BIGINT >> (11*i)) & (width-1)``.
Structural constraint: ``depth * log2(width) <= 60`` (4 x 11 = 44
bits used here).

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

from .hashing import md5_int60

CMS_DEPTH = 4
CMS_WIDTH = 2048  # eps = e/width ~ 0.00133 -> overestimate <= 0.133% of N
_WIDTH_BITS = 11  # log2(CMS_WIDTH)


def _check_params(depth: int, width: int) -> int:
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    bits = width.bit_length() - 1
    if depth * bits > 60:
        raise ValueError(
            f"depth * log2(width) = {depth * bits} exceeds the 60 "
            "hash bits md5_int60 provides"
        )
    return bits


def _bucket_from_h(h: Column, i: int, bits: int, width: int) -> Column:
    """Row-i bucket: the i-th disjoint ``bits``-bit slice of the
    per-token 60-bit hash — shift + mask, no extra hashing."""
    return F.shiftright(h, bits * i).bitwiseAND(F.lit(width - 1))


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """ONE-row DataFrame ``(cms: map<long,long>, n_total: long)`` —
    the packed md5-bucket sketch over every row of ``tokens``.  Cell
    key is the flat address ``i * width + bucket``; ``n_total`` (the
    stream length N in the error bound) falls out of row 0's cells.
    The hash is BOUND as its own projection so the md5+parse runs
    once per row, not once per probe row."""
    bits = _check_params(depth, width)
    hashed = tokens.select(md5_int60(F.col(token_col)).alias("h"))
    probes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _bucket_from_h(F.col("h"), i, bits, width).alias("b"),
                )
                for i in range(depth)
            ]
        )
    )
    cells = (
        hashed.select(probes.alias("p"))
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
    bits = _check_params(depth, width)
    h = md5_int60(token)
    return F.least(
        *[
            F.coalesce(
                F.element_at(
                    cms,
                    F.lit(i * width).cast("long")
                    + _bucket_from_h(h, i, bits, width).cast("long"),
                ),
                F.lit(0).cast("long"),
            )
            for i in range(depth)
        ]
    )
