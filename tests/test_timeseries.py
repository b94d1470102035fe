"""Resample + linear interpolation: hand-computed gap fills."""

from __future__ import annotations

from geoscale_healthflow_etl_django_analytics_spark.operators.timeseries import (
    resample_interpolate,
)


def test_resample_interpolate_hand_case(spark):
    """Key 1: observations at hours 0 (v=10) and 3 (v=40) — hours 1, 2
    must interpolate to 20, 30. Key 2: single observation -> single
    grid row, observed. Two readings in one bucket average exactly."""
    rows = [
        (1, "2024-01-01 00:10:00", 8.0),
        (1, "2024-01-01 00:50:00", 12.0),  # bucket 0 avg -> 10.0
        (1, "2024-01-01 03:30:00", 40.0),
        (2, "2024-01-05 07:15:00", 5.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, value double"
    ).selectExpr("user_id", "cast(ts as timestamp_ntz) ts", "value")
    out = {
        (r.user_id, r.b): (r.v, r.observed)
        for r in resample_interpolate(
            df, "ts", "value", ["user_id"], 3600
        ).collect()
    }
    base = [b for (u, b) in out if u == 1][0] // 1  # smallest bucket for key 1
    b0 = min(b for (u, b) in out if u == 1)
    assert out[(1, b0)] == (10.0, True)
    assert out[(1, b0 + 1)] == (20.0, False)
    assert out[(1, b0 + 2)] == (30.0, False)
    assert out[(1, b0 + 3)] == (40.0, True)
    k2 = [(u, b) for (u, b) in out if u == 2]
    assert len(k2) == 1 and out[k2[0]] == (5.5, True)
    assert len(out) == 5
