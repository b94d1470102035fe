"""C20/C21 ring hygiene: validity repairs, quantize, Douglas-Peucker —
edge cases beyond the registered closed-form queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import geo


def _ring_df(spark, pts):
    df = spark.createDataFrame([(1,)], "id int")
    arr = F.array(
        *[
            F.struct(F.lit(float(x)).alias("lon"), F.lit(float(y)).alias("lat"))
            for x, y in pts
        ]
    )
    return df.select(arr.alias("ring"))


def _pts(row):
    return [(p["lon"], p["lat"]) for p in row]


def test_fix_ring_idempotent_on_valid(spark):
    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    out = _ring_df(spark, sq).select(geo.fix_ring(F.col("ring")).alias("r")).collect()
    assert _pts(out[0].r) == [(float(x), float(y)) for x, y in sq]


def test_fix_ring_closes_and_dedupes_runs(spark):
    bad = [(0, 0), (0, 0), (0, 0), (4, 0), (4, 4), (4, 4), (0, 4)]
    out = _ring_df(spark, bad).select(geo.fix_ring(F.col("ring")).alias("r")).collect()
    assert _pts(out[0].r) == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]


def test_ring_validity_flags_degenerate(spark):
    cases = {
        "zero_area": [(0, 0), (4, 0), (0, 0)],  # collapsed, closed, <4 pts
        "open": [(0, 0), (4, 0), (4, 4), (0, 4)],
        "valid": [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
    }
    for name, pts in cases.items():
        r = (
            _ring_df(spark, pts)
            .select(geo.ring_is_valid(F.col("ring")).alias("v"))
            .collect()[0]
            .v
        )
        assert r == (name == "valid"), name


def test_quantize_ring_collapses_staircase(spark):
    # half-unit staircase snaps to the unit grid and collapses runs
    stair = [(0.0, 0.0), (0.4, 0.1), (0.6, 0.4), (1.4, 0.6), (2.0, 1.0), (0.0, 0.0)]
    out = (
        _ring_df(spark, stair)
        .select(geo.quantize_ring(F.col("ring"), 1.0).alias("r"))
        .collect()
    )
    assert _pts(out[0].r) == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (2.0, 1.0), (0.0, 0.0)]


def test_simplify_dp_keeps_real_bends(spark):
    # a genuine bend ABOVE tolerance must survive; collinear midpoints go
    pts = [(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 3.0), (4.0, 6.0), (0.0, 0.0)]
    df = _ring_df(spark, pts).select(F.lit(1).alias("poly_id"), "ring")
    out = geo.simplify_rings_dp(df, tolerance=0.1).collect()[0]
    assert out.n_before == 6 and out.n_after == 4
    assert _pts(out.ring) == [(0.0, 0.0), (4.0, 0.0), (4.0, 6.0), (0.0, 0.0)]

    # tolerance large enough swallows the bend too (endpoints survive)
    out2 = geo.simplify_rings_dp(df, tolerance=10.0).collect()[0]
    assert out2.n_after == 2
