"""Streaming Count-Min heavy hitters — the sketch family's §2.10 form.

``functions/sketches.py`` documents WHY the CMS exists at 100 TB: the
streaming/pre-aggregation shape, where per-partition (here per-micro-
batch) sketches merge by cell-wise addition and a long-running ingest
tracks heavy hitters without ever materializing the distinct-token
set.  This module runs that shape for real: a document file stream is
drained with an AvailableNow ``foreachBatch`` that computes the
constant-size per-batch sketch and appends it to a parquet store —
one row (depth x width map, n_total) per micro-batch, written into a
``batch_id=N`` subdirectory with overwrite so a foreachBatch retry is
idempotent (the ingest-gate convention).  The merged sketch is an
exact cell-wise sum over the stored rows (integer addition commutes
and associates), so streaming == batch holds BYTE-EXACTLY for the
sketch, and therefore for every point estimate — pinned by
tests/test_streaming_ingest.py's sibling test module.

At scale the store stays tiny forever: each row is <= depth*width
cells regardless of corpus size, so a year of micro-batches is still
megabytes, and re-merging is a constant-size groupBy.  A compaction
step (replace the store with its one-row merge) is the obvious
production refinement; it changes nothing about the math.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hll import hll_registers
from ..functions.sketches import CMS_DEPTH, CMS_WIDTH, cms_sketch
from ..functions.text import tokens


def merge_sketches(per_batch: DataFrame) -> DataFrame:
    """Cell-wise sum of ``(cms: map<long,long>, n_total)`` rows into
    the single merged sketch — the CMS mergeability property as one
    explode + groupBy over at most depth*width keys per row."""
    cells = per_batch.select(
        F.explode(F.col("cms")).alias("cell", "cnt")
    )
    merged = cells.groupBy("cell").agg(F.sum("cnt").alias("cnt"))
    totals = per_batch.agg(
        F.sum("n_total").cast("long").alias("n_total")
    )
    return merged.agg(
        F.map_from_arrays(
            F.collect_list("cell"), F.collect_list("cnt")
        ).alias("cms")
    ).crossJoin(F.broadcast(totals))


def run_streaming_cms(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    max_files_per_trigger: int = 1,
) -> str:
    """Drain a parquet document stream, appending one constant-size
    sketch row per micro-batch under ``work_dir/sketches``.  Returns
    the sketch-store path; ``merge_sketches(spark.read.parquet(path))``
    is the corpus sketch."""
    sketch_dir = os.path.join(work_dir, "sketches")
    checkpoint = os.path.join(work_dir, "checkpoint")
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .schema
    )

    def _sketch(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        cms_sketch(toks, depth=depth, width=width).write.mode(
            "overwrite"
        ).parquet(os.path.join(sketch_dir, f"batch_id={batch_id}"))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .writeStream.foreachBatch(_sketch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sketch_dir


def merge_hll_registers(per_batch: DataFrame) -> DataFrame:
    """Cell-wise MAX of per-batch ``(j, mj)`` register rows — the HLL
    counterpart of :func:`merge_sketches` (the CMS merges by sum, the
    HLL by max; both commute and associate, which is the whole
    streaming claim).  Feed the result to
    ``functions.hll.hll_summary`` for the merged estimate."""
    return per_batch.groupBy("j").agg(F.max("mj").alias("mj"))


def run_streaming_hll(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    text_col: str = "text",
    max_files_per_trigger: int = 1,
) -> str:
    """Drain a parquet document stream, appending one <= HLL_M-row
    register table per micro-batch under ``work_dir/hll`` — the
    streaming distinct-token count: a year of micro-batches is still
    kilobytes per batch, and the corpus cardinality is
    ``hll_summary(merge_hll_registers(read(path)))`` at any moment,
    with no distinct-token state anywhere."""
    hll_dir = os.path.join(work_dir, "hll")
    checkpoint = os.path.join(work_dir, "hll_checkpoint")
    schema = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .schema
    )

    def _registers(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
        )
        hll_registers(toks).write.mode("overwrite").parquet(
            os.path.join(hll_dir, f"batch_id={batch_id}")
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(source_dir)
        .writeStream.foreachBatch(_registers)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return hll_dir
