"""Count-Min sketch (functions/sketches.py): the deterministic
never-underestimate guarantee over ALL tokens, cell-wise mergeability
(the streaming claim), and constant state size."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions import sketches as sk
from geoscale_healthflow_etl_django_analytics_spark.functions.text import tokens
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _toks(spark):
    return load_table(spark, SF, "documents").select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )


def test_never_underestimates_any_token(spark):
    """The CMS deterministic guarantee, checked for EVERY distinct
    token (the registered query checks the top 20; this is the full
    property)."""
    toks = _toks(spark).select("token")
    sketch = sk.cms_sketch(toks)
    exact = toks.groupBy("token").agg(F.count("*").alias("exact"))
    est = sk.cms_estimate(F.col("token"), F.col("cms"))
    bad = (
        exact.crossJoin(F.broadcast(sketch))
        .filter(est < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_sketch_merges_cellwise(spark):
    """Per-partition sketches must merge by cell-wise addition — the
    property that makes CMS the streaming/pre-agg form. Split the
    stream by doc parity, sum the two maps cell-wise, compare with
    the whole-stream sketch."""
    toks = _toks(spark)
    whole = sk.cms_sketch(toks.select("token")).collect()[0]
    a = sk.cms_sketch(
        toks.filter(F.col("doc_id") % 2 == 0).select("token")
    ).collect()[0]
    b = sk.cms_sketch(
        toks.filter(F.col("doc_id") % 2 == 1).select("token")
    ).collect()[0]
    merged: dict[int, int] = dict(a["cms"])
    for cell, cnt in b["cms"].items():
        merged[cell] = merged.get(cell, 0) + cnt
    assert merged == dict(whole["cms"])
    assert a["n_total"] + b["n_total"] == whole["n_total"]


def test_state_is_constant_size(spark):
    row = sk.cms_sketch(_toks(spark).select("token")).collect()[0]
    assert len(row["cms"]) <= sk.CMS_DEPTH * sk.CMS_WIDTH


def test_unseen_token_estimates_reasonably(spark):
    """A token the stream never contained estimates its collision
    mass only — tiny relative to N (and never negative)."""
    toks = _toks(spark).select("token")
    sketch = sk.cms_sketch(toks)
    probe = toks.sparkSession.createDataFrame(
        [("___never-in-corpus___",)], "token string"
    )
    est = sk.cms_estimate(F.col("token"), F.col("cms"))
    r = probe.crossJoin(F.broadcast(sketch)).select(
        est.alias("e"), "n_total"
    ).collect()[0]
    assert 0 <= r["e"] <= 2.718281828459045 / sk.CMS_WIDTH * r["n_total"]


def test_streaming_batches_merge_to_corpus_sketch(spark):
    """The streaming claim, run for real: drain the corpus as a file
    stream (2 files -> 2 micro-batches), build one constant-size CMS
    per micro-batch in foreachBatch, merge cell-wise on the driver
    (the sketch is 4x2048 cells at ANY corpus size, so collecting it
    per batch is bounded by construction), and the accumulated sketch
    must equal the whole-corpus sketch exactly — heavy-hitter
    tracking under ingest without ever materializing the distinct
    token set."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="hf-cms-stream-")
    ck = tempfile.mkdtemp(prefix="hf-cms-ck-")
    try:
        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(d)

        acc: dict[int, int] = {}
        totals = []

        def merge_batch(batch_df, _bid):
            row = sk.cms_sketch(
                batch_df.select(
                    F.explode(tokens(F.lower(F.col("text")))).alias("token")
                )
            ).collect()[0]
            for cell, cnt in row["cms"].items():
                acc[cell] = acc.get(cell, 0) + cnt
            totals.append(row["n_total"])

        q = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        assert len(totals) >= 2, "expected >= 2 micro-batches"
        whole = sk.cms_sketch(
            docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        ).collect()[0]
        assert acc == dict(whole["cms"])
        assert sum(totals) == whole["n_total"]
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
