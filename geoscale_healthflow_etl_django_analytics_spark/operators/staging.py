"""Staging write layer — SURVEY.md §2.1 S7/S8 + the dynamic-table
regime (§1.1), FIXTURES.md §7.

The reference materializes one Postgres table per (analytics type,
district, sector) with the filter context serialized into the TABLE
NAME (`hc_data_yearly_statist_bugesera_kamabuye`) AND duplicated as
`filter_district/filter_sector/filter_years` columns plus audit
timestamps (`postgresql_service.py:499-614`, esp. :542-553).

Spark-first: ONE table per analytics type, the filter context only as
columns — which then serve as partition keys, so "pick the table for
district X" becomes partition pruning. The reference's own column
duplication is the proof this mapping loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import audit_timestamp, sanitize_name


def with_staging_context(
    df: DataFrame,
    filter_district: str | None,
    filter_sector: str | None,
    filter_years: list[int] | None,
) -> DataFrame:
    """Append the reference's filter-context + audit columns
    (postgresql_service.py:542-553): filter_* record what query
    produced the table; created_at is the load stamp."""
    return (
        df.withColumn(
            "filter_district",
            sanitize_name(F.lit(filter_district if filter_district else "all")),
        )
        .withColumn(
            "filter_sector",
            sanitize_name(F.lit(filter_sector if filter_sector else "all")),
        )
        .withColumn(
            "filter_years",
            F.lit(",".join(str(y) for y in filter_years) if filter_years else "all"),
        )
        .withColumn("created_at", audit_timestamp())
    )


def write_staging(
    df: DataFrame,
    base_path: str,
    analytics_type: str,
    filter_district: str | None = None,
    filter_sector: str | None = None,
    filter_years: list[int] | None = None,
    mode: str = "overwrite",
) -> str:
    """S7 replace-mode staging write: one directory per analytics
    type, partitioned by the filter context (the scalable form of the
    reference's dynamic table names). Returns the written path."""
    out = f"{base_path}/{analytics_type}"
    staged = with_staging_context(df, filter_district, filter_sector, filter_years)
    (
        staged.write.mode(mode)
        .partitionBy("filter_district", "filter_sector")
        .parquet(out)
    )
    return out
