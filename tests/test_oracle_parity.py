"""Mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly at sf0.001 (fast) — run manually at
sf0.01 before shipping via SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01.
"""

from __future__ import annotations

import os

import pytest

from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY
from geoscale_healthflow_etl_django_analytics_spark.testing import compare_query

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(spark, name, PARITY_SF)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(callable(f) for f in qs.values())
