"""Parquet catalog over the synthetic star schema.

Replaces the reference's MongoDB collection-per-(dataset, location,
year) layout (`app/etl_app/services/health_center_mongodb_service.py:141-243`,
S5/S6 in SURVEY.md §2.1): what was "open every matching collection and
union the cursors" becomes a single partition-aware parquet scan where
Catalyst prunes partitions/row-groups from pushed-down predicates.

Scale notes:
- Reads are plain ``spark.read.parquet`` so filter pushdown, column
  pruning and (at cluster scale) partition pruning all apply.
- The nanosecond-timestamp feed (``events.ts``) is read via the
  nanos-as-long legacy mode and converted to ``timestamp_ntz`` at
  microsecond precision — the same truncation DuckDB applies, so the
  oracle sees identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns written as parquet TIMESTAMP(NANOS) by the data generator;
# Spark reads them as long (nanosAsLong) and we rebuild a timestamp.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_session_confs(spark: SparkSession) -> None:
    # The verify driver hands us its own session; these are
    # runtime-settable and required for correct reads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# plan-object memo: re-reading a parquet footer costs ~100-200 ms of
# driver time per call; registry builders are invoked per query, so
# without this each query pays footer-listing for every table it
# touches. Keyed by session id so a restarted session re-reads.
_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``{sf_dir}/{name}.parquet``."""
    key = (id(spark), sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # nanos → micros (floor div), then a naive timestamp; this
            # matches DuckDB's microsecond TIMESTAMP truncation exactly.
            df = df.withColumn(
                col,
                F.expr(
                    f"cast(timestamp_micros(cast({col} div 1000 as long)) "
                    "as timestamp_ntz)"
                ),
            )
    _DF_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
