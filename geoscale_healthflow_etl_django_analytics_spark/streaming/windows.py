"""Structured Streaming generalization of the reference's batch-wise
incremental processing — SURVEY.md §2.10.

The reference has no streaming engine: it emulates incrementality
with 100-row batches + progress docs + replace/append update modes
(`batch_processor.py:25,242-394`, `constants.py:4-13`). The
Spark-native equivalents built here:

- tumbling / sliding event-time windows with watermarks (the
  reference's month-bucketing A4 *is* a calendar tumbling window),
- session windows per user (gap-based),
- ``foreachBatch`` + merge upsert = the reference's append/upsert
  update mode with exactly-once micro-batches,
- ``Trigger.AvailableNow`` = the vestigial daily Airflow DAG
  (`dags/etl_pipeline.py:32-43`) as a scheduled catch-up run.

Every aggregation here also has a batch form registered in
registry.py with a DuckDB oracle (same expression over the static
events table), so streaming semantics are pinned by the same
correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..functions.exact import exact_sum

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # watermarks require TIMESTAMP (not NTZ); session tz is pinned to
    # UTC by the session factory, so the wall-clock value is unchanged.
    return reader.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    Watermark bounds state so late data beyond it is dropped —
    the correctness/retention trade the reference's timeout+partial-
    results hack (§2.10) approximated without semantics."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_value_avg(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding window global value average (each event contributes to
    window/slide overlapping windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), 2).alias("value_sum"))
        .select(F.col("w.start").alias("w_start"), "n_events", "value_sum")
    )


def user_sessions(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based session windows per user: a session closes after
    ``gap`` of inactivity; end = last event + gap."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), exact_sum(F.col("value"), 2).alias("value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink
    and return the sink as a DataFrame (callers decide whether to
    collect, write, or compose further) — the scheduled-batch
    execution mode."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
):
    """§2.10 append/upsert update mode: each micro-batch MERGEs into
    the parquet target via the S8 full-outer-join upsert (idempotent
    across retries thanks to deterministic keys — C14).

    Crash-safety details: the initialize path is taken ONLY when the
    target genuinely does not exist (an explicit FileSystem check — a
    transient read error must propagate, not silently reinitialize
    the target with one micro-batch of data); repeated keys within a
    micro-batch are collapsed before the merge (a full-outer join
    would fan them out); and the new version is committed by a single
    FileSystem rename swap, not a slow in-place overwrite of the live
    target."""
    from ..operators.upsert import merge_upsert

    def _fs_and_path(spark: SparkSession, path: str):
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates(keys)
        fs, jtarget = _fs_and_path(spark, target_path)
        if not fs.exists(jtarget):
            batch_df.write.mode("overwrite").parquet(target_path)
            return
        existing = spark.read.parquet(target_path)
        merged = merge_upsert(existing, batch_df, keys).drop("merge_action")
        tmp = f"{target_path}_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # commit = two renames (retire old, promote new): the window
        # where the target is missing is two metadata ops, not a full
        # rewrite; the retired copy survives until the next cleanup.
        fs_tmp, jtmp = _fs_and_path(spark, tmp)
        old = f"{target_path}_old_{batch_id}"
        _, jold = _fs_and_path(spark, old)
        fs.delete(jold, True)
        fs.rename(jtarget, jold)
        fs.rename(jtmp, jtarget)
        fs.delete(jold, True)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
