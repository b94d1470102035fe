"""Count-Min sketch as pure Column arithmetic — mergeable heavy-hitter
counting for streams/corpora too wide to count exactly.

Companion to the Bloom filter (``functions/bloom.py``) and the
GK/HLL bound query (``registry.a13_sketch_vs_exact_bounds``): the
sketch state is a CONSTANT-size table — ``depth x width`` cells
regardless of corpus size — built with one map-side-combinable
``groupBy().count()`` and collapsed to a one-row ``map<long,long>``
for scalar composition.  Each cell update and each point estimate is
JVM-side ``xxhash64`` + mask arithmetic; no Python, no UDF.

Guarantees (Cormode & Muthukrishnan 2005): a point estimate NEVER
underestimates (every cell the token hashes to counted every one of
its occurrences), and overestimates by more than ``e/width * N``
with probability at most ``e^-depth`` (N = total stream weight).
Both sides of that contract are what the registered bound query
checks live against the exact counts.

At 100 TB the exact token count is itself fine (it is one shuffle of
the distinct-token set) — what the sketch buys is the STREAMING /
pre-aggregation form: per-partition sketches merge by cell-wise
addition (the groupBy does exactly that), so a long-running ingest
can maintain heavy-hitter counts without ever holding the distinct
token set anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 2048  # eps = e/width ~ 0.00133 -> overestimate <= 0.133% of N


def _bucket(token: Column, i: int, width: int) -> Column:
    """Row-i bucket for a token.  ``width`` must be a power of two so
    the modulo is a mask (non-negative even for negative xxhash64)."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    return F.xxhash64(token, F.lit(i)).bitwiseAND(F.lit(width - 1))


def cms_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """ONE-row DataFrame ``(cms: map<long,long>, n_total: long)`` —
    the packed sketch over every row of ``tokens`` (one row = one
    occurrence; pre-aggregated ``(token, cnt)`` inputs should explode
    or, better, extend this with a weight column).

    Cell key is ``i * width + bucket`` — a flat 64-bit address so one
    map holds all rows of the sketch.  ``n_total`` (the stream length
    N in the error bound) falls out of row 0's cells for free.
    """
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
    """Point estimate: min over rows of the token's cell — the
    classic CM estimator.  Missing cells read 0 (a token the sketch
    never saw estimates 0 — correct, not an underestimate)."""
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
