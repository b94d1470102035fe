"""Structured Streaming semantics tests: the streaming window
aggregations must converge to exactly the batch results when the
stream is drained (Trigger.AvailableNow), and the foreachBatch
upsert must be idempotent."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators.upsert import merge_upsert
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table
from geoscale_healthflow_etl_django_analytics_spark.streaming import windows as sw

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Copy the events table into a stream-source directory (split in
    two files so availableNow sees >1 micro-batch with maxFilesPerTrigger)."""
    d = tempfile.mkdtemp(prefix="hf-stream-")
    ev = load_table(spark, SF, "events")
    ev.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.mode("append").parquet(d)
    ev.filter(F.dayofmonth("ts") > 15).coalesce(1).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows_key(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_streaming_tumbling_equals_batch(spark, events_dir):
    stream = sw.read_event_stream(spark, events_dir, max_files_per_trigger=1)
    got = sw.run_available_now(sw.tumbling_counts(stream), "t_tumbling").collect()
    want = sw.tumbling_counts(load_table(spark, SF, "events")).collect()
    cols = ["w_start", "event_type", "n_events", "value_sum"]
    assert _rows_key(got, cols) == _rows_key(want, cols)


def test_streaming_sessions_equal_batch(spark, events_dir):
    stream = sw.read_event_stream(spark, events_dir)
    got = sw.run_available_now(sw.user_sessions(stream), "t_sessions").collect()
    want = sw.user_sessions(load_table(spark, SF, "events")).collect()
    cols = ["user_id", "session_start", "session_end", "n_events", "value_sum"]
    assert _rows_key(got, cols) == _rows_key(want, cols)


def test_foreach_batch_upsert_idempotent(spark, events_dir):
    target = tempfile.mkdtemp(prefix="hf-upsert-") + "/t"
    ckpt1 = tempfile.mkdtemp(prefix="hf-ckpt1-")
    ckpt2 = tempfile.mkdtemp(prefix="hf-ckpt2-")
    stream = sw.read_event_stream(spark, events_dir).select(
        "event_id", "event_type", "value"
    )
    q = sw.foreach_batch_upsert(stream, target, ["event_id"], ckpt1)
    q.awaitTermination()
    n1 = spark.read.parquet(target).count()
    # re-run the whole stream from a fresh checkpoint: same keys →
    # updates, not duplicates
    stream2 = sw.read_event_stream(spark, events_dir).select(
        "event_id", "event_type", "value"
    )
    q2 = sw.foreach_batch_upsert(stream2, target, ["event_id"], ckpt2)
    q2.awaitTermination()
    n2 = spark.read.parquet(target).count()
    assert n1 == n2 == 1000


def test_merge_upsert_classification(spark):
    existing = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k int, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 20.0), (3, "c", 3.0)], "k int, s string, v double"
    )
    out = {r.k: (r.s, r.v, r.merge_action) for r in merge_upsert(existing, updates, ["k"]).collect()}
    assert out[1] == ("a", 1.0, "kept")
    assert out[2] == ("b2", 20.0, "updated")
    assert out[3] == ("c", 3.0, "inserted")


def test_stateful_running_totals_converge_to_batch(spark, events_dir):
    """applyInPandasWithState per-user counters: after draining the
    stream (2 files -> >=2 micro-batches with maxFilesPerTrigger=1),
    the LAST update per user must equal the batch aggregate."""
    from geoscale_healthflow_etl_django_analytics_spark.streaming import stateful

    stream = sw.read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        stateful.running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends every update; the final state
    # per user is the row with the max n_events
    got_all = spark.sql("SELECT * FROM t_stateful").collect()
    final = {}
    for r in got_all:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r

    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = {r.user_id: r for r in stateful.batch_user_totals(ev).collect()}
    assert set(final) == set(want)
    for uid, w in want.items():
        g = final[uid]
        assert g.n_events == w.n_events, uid
        assert abs(g.value_sum - w.value_sum) < 1e-6, uid
        assert g.last_ts == w.last_ts, uid


def test_watermark_drops_late_data(spark):
    """Event-time correctness: with a watermark, data arriving after
    the watermark has passed its window must NOT update the result —
    the semantic the reference's timeout+partial-results hack lacked."""
    import tempfile

    d = tempfile.mkdtemp(prefix="hf-late-")
    out, ckpt = d + "_out", d + "_ckpt"
    ev = load_table(spark, SF, "events")
    # batch 1: everything EXCEPT hour 0 of Jan 2 (arrives late below);
    # includes much later data so the watermark advances far past it
    on_time = ev.filter(~((F.dayofmonth("ts") == 2) & (F.hour("ts") == 0)))
    late = ev.filter((F.dayofmonth("ts") == 2) & (F.hour("ts") == 0))
    assert late.count() > 0
    on_time.coalesce(1).write.mode("append").parquet(d)

    def drain():
        stream = sw.read_event_stream(spark, d, max_files_per_trigger=1)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # now the hour-0-Jan-2 data arrives — weeks behind the watermark
    late.coalesce(1).write.mode("append").parquet(d)
    drain()

    rows = (
        spark.read.parquet(out)
        .filter(F.col("w_start") == F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .collect()
    )
    # the late window was never emitted on time (no data then) and the
    # late rows are dropped by the watermark -> no row for that hour
    assert rows == [], rows


def test_session_window_drops_late_event(spark):
    """SURVEY §2.10 session contract: an event arriving behind the
    watermark must NOT join (or extend) its session. The reference's
    timeout+partial-results hack had no such semantics; here the
    closed session is emitted from on-time events only."""

    def _events(rows):
        return (
            spark.createDataFrame(
                rows,
                "event_id long, ts string, user_id long, event_type string, "
                "value double, props string",
            )
            .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            .select("event_id", "ts", "user_id", "event_type", "value", "props")
        )

    d = tempfile.mkdtemp(prefix="hf-latesess-")
    out, ckpt = d + "_out", d + "_ckpt"
    # on-time: user 1's session (2 events, gap 5 min -> closes 10:07),
    # plus a much later event that advances the 1h watermark past it
    _events(
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 10:02:00", 1, "click", 2.0, "{}"),
            (3, "2024-01-01 20:00:00", 99, "click", 9.0, "{}"),
        ]
    ).coalesce(1).write.mode("append").parquet(d)

    def drain():
        q = (
            sw.user_sessions(sw.read_event_stream(spark, d))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # late: lands INSIDE user 1's session span but hours behind the
    # watermark (19:00) restored from the checkpoint
    _events([(4, "2024-01-01 10:01:00", 1, "click", 100.0, "{}")]).coalesce(
        1
    ).write.mode("append").parquet(d)
    drain()

    rows = [r for r in spark.read.parquet(out).collect() if r.user_id == 1]
    assert len(rows) == 1, rows
    (s,) = rows
    # 2 on-time events only — the late value-100 event was dropped
    assert s.n_events == 2
    assert s.value_sum == 3.0
    assert str(s.session_start) == "2024-01-01 10:00:00"
    assert str(s.session_end) == "2024-01-01 10:07:00"


def test_foreach_batch_upsert_dedups_batch_keys(spark):
    """A micro-batch containing repeated keys must collapse to one row
    per key (a raw full-outer merge would fan duplicates out)."""
    import pyspark.sql.functions as F

    src_dir = tempfile.mkdtemp(prefix="hf-dupsrc-")
    target = tempfile.mkdtemp(prefix="hf-duptgt-") + "/t"
    ckpt = tempfile.mkdtemp(prefix="hf-dupckpt-")
    dup = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a", 2.0), (2, "b", 3.0)] * 2,
        "event_id long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(0)).cast("timestamp_ntz").alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    dup.select("event_id", "ts", "user_id", "event_type", "value", "props").write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = sw.read_event_stream(spark, src_dir).select("event_id", "value")
    q = sw.foreach_batch_upsert(stream, target, ["event_id"], ckpt)
    q.awaitTermination()
    first = {r.event_id: r.value for r in spark.read.parquet(target).collect()}
    assert len(first) == 2  # initialize path dedups too
    # the in-batch winner is deterministic: highest value for the key
    # (latest-ts-then-columns-desc ordering), not an arbitrary survivor
    assert first[1] == 2.0
    # second run hits the merge path against the existing target
    ckpt2 = tempfile.mkdtemp(prefix="hf-dupckpt2-")
    stream2 = sw.read_event_stream(spark, src_dir).select("event_id", "value")
    q2 = sw.foreach_batch_upsert(stream2, target, ["event_id"], ckpt2)
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == 2


def test_foreach_batch_upsert_recovers_interrupted_commit(spark):
    """Simulate a crash INSIDE the two-rename commit window: the target
    was renamed away to _old_{b} and the fully-written _tmp_{b} never
    got promoted. The next batch must promote the tmp (the complete
    merged state) and keep merging — NOT silently reinitialize the
    target from one micro-batch."""
    import shutil as _sh

    base = tempfile.mkdtemp(prefix="hf-recover-")
    target = base + "/t"
    # last committed state (now retired to _old_7 by the crashed swap)
    spark.createDataFrame(
        [(i, float(i)) for i in range(1, 5)], "event_id long, value double"
    ).write.parquet(target)
    _sh.move(target, f"{target}_old_7")
    # the crashed batch's fully-written merged output, never promoted
    spark.createDataFrame(
        [(i, float(i) * 10) for i in range(1, 6)], "event_id long, value double"
    ).write.parquet(f"{target}_tmp_7")

    src_dir = tempfile.mkdtemp(prefix="hf-recsrc-")
    ckpt = tempfile.mkdtemp(prefix="hf-recckpt-")
    spark.createDataFrame(
        [(6, "2024-01-01 00:00:00", 0, "x", 60.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = sw.read_event_stream(spark, src_dir).select("event_id", "value")
    q = sw.foreach_batch_upsert(stream, target, ["event_id"], ckpt)
    q.awaitTermination()

    got = {r.event_id: r.value for r in spark.read.parquet(target).collect()}
    # tmp (ids 1-5, values ×10) recovered, then the new batch merged in
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0, 5: 50.0, 6: 60.0}
    # leftovers cleaned up
    import os as _os

    assert not _os.path.exists(f"{target}_old_7")
    assert not _os.path.exists(f"{target}_tmp_7")


@pytest.mark.parametrize("variant", ["plain", "chunked"])
def test_asof_join_backward_semantics(spark, variant):
    """Tie at equal time matches (>= semantics); earlier rows carry
    forward; rows before any right row survive with nulls. Both the
    per-key window form and the bucket-chunked form must agree —
    bucket_span=4 splits this timeline across several buckets, so the
    boundary-carry path (not just the in-bucket window) is exercised."""
    from geoscale_healthflow_etl_django_analytics_spark.operators import joins as oj

    left = spark.createDataFrame(
        [(1, 5, "p5"), (1, 9, "p9"), (1, 2, "p2"), (2, 4, "q4")],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 3, 30.0), (1, 7, 70.0), (1, 9, 95.0)],
        "k int, t int, w double",
    ).select("k", "t", F.col("t").alias("rt"), "w")
    if variant == "plain":
        joined = oj.asof_join_backward(
            left, right, time_col="t", by_cols=["k"],
            carry_cols=["rt", "w"], suffix="",
        )
    else:
        joined = oj.asof_join_backward_chunked(
            left, right, time_col="t", by_cols=["k"],
            carry_cols=["rt", "w"], suffix="", bucket_span=4.0,
        )
    out = {r.tag: (r.rt, r.w) for r in joined.collect()}
    assert out["p2"] == (None, None)      # nothing at or before t=2
    assert out["p5"] == (3, 30.0)         # most recent <= 5
    assert out["p9"] == (9, 95.0)         # tie at equal time matches
    assert out["q4"] == (None, None)      # key with no right rows


def test_asof_output_name_collision_raises(spark):
    """suffix='' with a carry col named like a left payload column
    would emit a duplicate-named (ambiguous) DataFrame — both forms
    must refuse up front."""
    from geoscale_healthflow_etl_django_analytics_spark.operators import joins as oj

    left = spark.createDataFrame([(1, 1, "x")], "k int, t int, w string")
    right = spark.createDataFrame([(1, 1, 2.0)], "k int, t int, w double")
    with pytest.raises(ValueError, match="collides"):
        oj.asof_join_backward(
            left, right, time_col="t", by_cols=["k"],
            carry_cols=["w"], suffix="",
        )
    with pytest.raises(ValueError, match="collides"):
        oj.asof_join_backward_chunked(
            left, right, time_col="t", by_cols=["k"],
            carry_cols=["w"], suffix="",
        )


def test_progress_listener_tracks_batches(spark, events_dir):
    """§2.10 progress tracking: the reference's per-batch progress doc
    (stage/progress/message/completed) re-expressed as a
    StreamingQueryListener — one doc per query, per-batch history,
    completion on termination, no code in the batch hot loop."""
    from geoscale_healthflow_etl_django_analytics_spark.streaming.progress import (
        ProgressTrackerListener,
        STAGE_COMPLETED,
    )

    listener = ProgressTrackerListener()
    spark.streams.addListener(listener)
    try:
        stream = sw.read_event_stream(spark, events_dir, max_files_per_trigger=1)
        q = (
            sw.tumbling_counts(stream)
            .writeStream.format("memory")
            .queryName("t_progress")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        qid = str(q.id)
        q.awaitTermination()
        doc = listener.wait_for(qid, lambda d: d["completed"])
        assert doc["stage"] == STAGE_COMPLETED
        assert doc["error"] is None
        assert doc["batches"] >= 2  # two files, one per trigger
        assert doc["total_rows"] == 1000
        hist = listener.history[qid]
        assert sum(h["num_input_rows"] for h in hist) == 1000
        assert all("batch_id" in h for h in hist)
    finally:
        spark.streams.removeListener(listener)


def test_stream_dedup_within_watermark(spark, events_dir):
    """Streaming dedup-by-id with bounded state: feed every event file
    TWICE (a full replay — the reference's re-upload scenario); the
    deduped stream must converge to exactly the batch-distinct rows."""
    d = tempfile.mkdtemp(prefix="hf-dedup-")
    try:
        ev = load_table(spark, SF, "events")
        for _ in range(2):  # two identical file drops
            ev.coalesce(1).write.mode("append").parquet(d)
        stream = sw.read_event_stream(spark, d, max_files_per_trigger=1)
        got = sw.run_available_now(
            sw.dedup_by_id(stream), "t_dedup", output_mode="append"
        ).collect()
        assert len(got) == ev.count()
        assert len({r.event_id for r in got}) == ev.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_interval_join_equals_batch(spark, events_dir):
    """Stream-stream interval join (watermarked both sides, time
    bounded both directions so join state evicts) must produce exactly
    the batch join's rows on an availableNow replay."""
    p_stream = sw.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    s_stream = sw.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "signup"
    )
    got = sw.run_available_now(
        sw.purchase_signup_interval_join(p_stream, s_stream),
        "t_ssjoin",
        output_mode="append",
    ).collect()

    ev = load_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = sw.purchase_signup_interval_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "signup"),
    ).collect()
    cols = ["event_id", "user_id", "ts", "signup_ts", "signup_value"]
    assert len(got) > 0
    assert _rows_key(got, cols) == _rows_key(want, cols)
