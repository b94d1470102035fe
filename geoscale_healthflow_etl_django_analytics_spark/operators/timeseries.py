"""Time-series regularization: resample to a fixed grid + linear
interpolation of gaps.

Generalizes the reference's J2 fill ladder (monthly yearly-average
fill, ``weather_data_prec_temp_etl_view.py``) into the standard
time-series op a feature pipeline needs: bucket readings onto a
uniform grid, then fill EMPTY buckets by linear interpolation between
the nearest observed neighbors. Pure window algebra — one shuffle on
the key for the carry windows, sequence-explode for the grid (bounded
by the key's own time span), no Python.

Cross-engine determinism: observed bucket values are
decimal-exact-averaged and rounded BEFORE interpolation, and the
interpolation expression is written with identical association in the
Column and SQL forms, so the driver's value-hash comparison holds at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import DECIMAL_TYPE, fround


def resample_interpolate(
    df: DataFrame,
    time_col: str,
    value_col: str,
    by_cols: list[str],
    step_seconds: int = 3600,
) -> DataFrame:
    """Returns one row per (key, bucket) over each key's [min, max]
    bucket span: ``v`` = the bucket's decimal-exact mean where
    observed, else the linear interpolation between the nearest
    observed buckets; ``observed`` marks which. Endpoints are always
    observed (the grid spans observed data), so no extrapolation
    branch exists."""
    step_ms = step_seconds * 1000
    bucket = F.floor(
        F.unix_millis(F.col(time_col).cast("timestamp")) / F.lit(step_ms)
    )
    obs = (
        df.select(*by_cols, bucket.alias("b"), F.col(value_col).alias("v"))
        .groupBy(*by_cols, "b")
        .agg(
            fround(
                F.sum(F.col("v").cast(DECIMAL_TYPE)).cast("double")
                / F.count("*"),
                6,
            ).alias("v_obs")
        )
    )
    grid = (
        obs.groupBy(*by_cols)
        .agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
        .select(
            *by_cols,
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("b"),
        )
    )
    j = grid.join(obs, [*by_cols, "b"], "left")
    w_prev = (
        Window.partitionBy(*by_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*by_cols)
        .orderBy("b")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ob = F.when(F.col("v_obs").isNotNull(), F.col("b"))
    v_prev = F.last("v_obs", ignorenulls=True).over(w_prev)
    b_prev = F.last(ob, ignorenulls=True).over(w_prev)
    v_next = F.first("v_obs", ignorenulls=True).over(w_next)
    b_next = F.first(ob, ignorenulls=True).over(w_next)
    interp = v_prev + (v_next - v_prev) * (
        (F.col("b") - b_prev) / (b_next - b_prev)
    )
    return j.select(
        *by_cols,
        "b",
        fround(F.coalesce(F.col("v_obs"), interp), 6).alias("v"),
        F.col("v_obs").isNotNull().alias("observed"),
    )


EWMA_ALPHA = 0.5  # halves are exact binary doubles -> cross-engine exact
EWMA_WINDOW = 8


def ewma_weights(
    alpha: float = EWMA_ALPHA, window: int = EWMA_WINDOW
) -> list[float]:
    """w_i = alpha * (1-alpha)^(i-1) for the i-th most recent PRIOR
    bucket.  With alpha=0.5 every weight is a power of two — exact in
    IEEE doubles, so both engines' weighted sums agree bit-for-bit
    when written in the same order."""
    return [alpha * (1.0 - alpha) ** (i - 1) for i in range(1, window + 1)]


def ewma_baseline_anomaly(
    df: DataFrame,
    time_col: str,
    value_col: str,
    key_col: str,
    step_seconds: int = 3600,
    alpha: float = EWMA_ALPHA,
    window: int = EWMA_WINDOW,
) -> DataFrame:
    """Time-decayed rolling baseline + anomaly flag — the monitoring
    shape over an event stream: per (key, hour) volume, an EWMA of
    the previous ``window`` observed buckets (weights renormalized
    over the buckets that exist, so the series start is well-defined
    without an extrapolation branch), and a flag when the current
    bucket is 2x above / below half the baseline.

    Exactness: bucket volumes are decimal-exact sums rounded 6dp;
    the EWMA numerator/denominator are FIXED-order sums of
    power-of-two weights (exact doubles), so the whole chain is
    engine- and partitioning-independent.  Bounded window => pure
    ``lag`` algebra, no recursion — the classical unbounded EWMA is
    a sequential recurrence Spark cannot shuffle; truncating at 8
    terms bounds the error by (1-alpha)^8 < 0.4% of the weight mass
    and keeps the operator a window expression.

    Scale: the groupBy pre-aggregates events to (key, bucket) rows —
    window partitions then hold #buckets rows (time-range-bounded),
    not #events, so per-key windows stay small at any corpus size;
    the events scan is one pass.
    """
    step_ms = step_seconds * 1000
    bucket = F.floor(
        F.unix_millis(F.col(time_col).cast("timestamp")) / F.lit(step_ms)
    )
    x = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("b"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "b")
        .agg(
            fround(
                F.sum(F.col("v").cast(DECIMAL_TYPE)).cast("double"), 6
            ).alias("x")
        )
    )
    w = Window.partitionBy("key").orderBy("b")
    lags = [F.lag("x", i).over(w).alias(f"l{i}") for i in range(1, window + 1)]
    lagged = x.select("key", "b", "x", *lags)

    weights = ewma_weights(alpha, window)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i, wi in enumerate(weights, start=1):
        li = F.col(f"l{i}")
        num = num + F.lit(wi) * F.coalesce(li, F.lit(0.0))
        den = den + F.when(li.isNotNull(), F.lit(wi)).otherwise(F.lit(0.0))
    ewma_prev = fround(num / F.when(den != 0.0, den), 6)

    scored = lagged.select(
        "key", "b", "x", ewma_prev.alias("ewma_prev")
    )
    ratio = F.when(
        F.col("ewma_prev") > 0,
        fround(F.col("x") / F.col("ewma_prev"), 4),
    )
    return scored.select(
        "key",
        "b",
        "x",
        "ewma_prev",
        ratio.alias("ratio"),
        F.coalesce(
            (ratio > F.lit(2.0)) | (ratio < F.lit(0.5)), F.lit(False)
        ).alias("is_anomaly"),
    )
