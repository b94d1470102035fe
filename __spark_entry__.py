"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``geoscale_healthflow_etl_django_analytics_spark.registry`` — every
implemented operator from SURVEY.md §2 registers there with both a
Spark builder and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A4 daily positivity — scan → semantic map →
    groupBy → rates) on sf0.001; driver checks rows>0."""
    return REGISTRY["hc_a4_daily_positivity"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
