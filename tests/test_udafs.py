"""GROUPED_AGG pandas UDF pinned against a DuckDB-computed expected
value (kept out of the driver oracle set so the no-Python invariant
on oracle paths holds)."""

from __future__ import annotations

import duckdb

from geoscale_healthflow_etl_django_analytics_spark.operators.udafs import (
    trimmed_mean_by_type,
)
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_trimmed_mean_matches_duckdb(spark):
    got = {
        r.event_type: (r.n, r.trimmed_mean)
        for r in trimmed_mean_by_type(load_table(spark, SF, "events")).collect()
    }
    con = duckdb.connect()
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(f"""
            WITH e AS (SELECT * FROM read_parquet('{SF}/events.parquet')),
            b AS (
                SELECT event_type,
                       quantile_cont(value, 0.1) AS lo,
                       quantile_cont(value, 0.9) AS hi,
                       count(*) AS n
                FROM e GROUP BY event_type
            )
            SELECT e.event_type, b.n, round(avg(e.value), 4)
            FROM e JOIN b USING (event_type)
            WHERE e.value BETWEEN b.lo AND b.hi
            GROUP BY e.event_type, b.n
        """).fetchall()
    }
    con.close()
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])
