"""Skew mitigation utilities.

AQE's skew-join splitting (on by default in session.py) handles most
runtime skew in joins. Two cases it does NOT cover, provided here:

- **Skewed aggregation keys** (one district = half the country): a
  two-phase salted aggregation spreads the hot key across
  ``n_salts`` partial groups, then re-aggregates. ``salted_agg``
  takes an explicit phase-2 re-aggregator per output (F.sum for
  sum/count, F.min/F.max for extrema); ``salted_sum`` is the
  sum/count-only shorthand.
- **Skewed broadcast-defeating joins** where the big side's hot key
  floods one task and the other side is too large to broadcast:
  explode the small side ``n_salts``× and salt the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): spreads hot groups
    without RNG (rand() would break retry determinism — same reason
    the reference moved to deterministic uuid5 ids, C14). Hashes the
    whole row so the salt varies WITHIN a group."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(col_name, F.pmod(F.xxhash64(*cols), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, tuple[Column, "callable"]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) finals. ``agg_cols`` maps output name →
    (phase-1 expression over the input, phase-2 re-aggregator applied
    to the partial column name). The pair makes decomposition explicit:
    sum/count re-aggregate with F.sum, min with F.min, max with F.max —
    a single hard-wired phase-2 F.sum would silently sum per-salt
    minima/maxima."""
    phase1 = (
        salted(df, n_salts)
        .groupBy(*group_cols, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in agg_cols.items()])
    )
    return phase1.groupBy(*group_cols).agg(
        *[refold(name).alias(name) for name, (_, refold) in agg_cols.items()]
    )


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    agg_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Sum/count-like convenience wrapper over :func:`salted_agg` —
    every partial re-aggregates with F.sum, which is ONLY correct for
    additively decomposable aggregates (sum, count; avg via
    sum+count). For min/max pass explicit re-aggregators to
    :func:`salted_agg`."""
    return salted_agg(
        df,
        group_cols,
        {name: (expr, F.sum) for name, expr in agg_cols.items()},
        n_salts,
    )


def salted_join_small_side(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Salted shuffle join: big side gets a deterministic PER-ROW salt,
    small side is exploded n_salts× so every (key, salt) bucket can
    match. Use when a hot key floods one shuffle partition and the
    small side is too big for broadcast.

    The salt must NOT be a function of the join keys alone — that maps
    every row of the hot key to the same salt and leaves the skew
    intact. We hash the whole row (via :func:`salted`) so rows of the
    hot key spread across all n_salts buckets while staying
    deterministic under task retry (rand() would not). Fully duplicate
    rows share a salt, which only matters if the hot key's rows are
    near-all identical — at which point aggregate-then-join beats
    salting anyway."""
    big_s = salted(big, n_salts)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*keys, "__salt"]).drop("__salt")
