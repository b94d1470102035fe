"""Bucketed tables for shuffle-free co-located joins.

The reference pre-indexes its staging tables for join-ish dashboard
queries (`table_schemas.py:40-48`); the Spark-native equivalent at
fact-to-fact scale is BUCKETING: write both sides bucketed (and
sorted) by the join key, and the sort-merge join runs with ZERO
exchange — each task reads matching bucket files directly. At 100 TB
this removes the single largest cost of the lineitem⋈orders class of
joins.

(Local caveat: bucketing requires ``saveAsTable`` — files carry the
bucket spec through the catalog, not the path.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dropped managed table can leave its location behind after a
    # failed write; clear it so saveAsTable doesn't refuse.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    if warehouse:
        import shutil

        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket
    count: Catalyst plans a SortMergeJoin with no Exchange on either
    side (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
