"""Word-level backoff LM (operators/lm_backoff.py): model-table
shape, ladder invariants, the <3-token drop convention, and the
broadcast-probe plan contract.  Value exactness is the registered
query's DuckDB oracle; these pin structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators.lm_backoff import (
    W,
    backoff_lm_scores,
    backoff_model,
)


def test_model_table_shapes(spark):
    """Sparse rungs are genuinely sparse (hash-kept fractions), the
    backoff rungs are COMPLETE — the ladder can never fall through."""
    tri, bo3, nll2bo = backoff_model(spark)
    n_tri = tri.count()
    # ~10% of 128^3 = ~209,715; md5 uniformity keeps it within 2%
    assert abs(n_tri - W**3 * 0.1) < W**3 * 0.002
    assert bo3.count() == W * W
    assert nll2bo.count() == W * W
    assert nll2bo.filter(F.col("nll2bo_u").isNull()).count() == 0
    # ~40% of pairs carry a real bigram rung
    n_bi = nll2bo.filter("has_bi").count()
    assert abs(n_bi - W * W * 0.4) < W * W * 0.02


def test_ladder_invariants_and_drop_convention(spark):
    """Every scored doc: positive NLL terms (counts < contexts by
    construction), unigram backoffs are a subset of bigram backoffs,
    and docs with <3 tokens drop."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "two words"),
            (3, "one"),
            (4, "a b c"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in backoff_lm_scores(docs).collect()}
    assert set(rows) == {1, 4}  # <3-token docs drop
    for r in rows.values():
        assert 0 <= r["n_unigram_backoffs"] <= r["n_bigram_backoffs"]
        assert r["n_bigram_backoffs"] <= r["n_grams"]
        assert r["mean_nll"] > 0 and r["perplexity"] > 1
    assert rows[1]["n_grams"] == 3 and rows[4]["n_grams"] == 1


def test_backoff_plan_is_broadcast_probes(spark):
    """The corpus path carries no window and no sort-merge join: the
    sparse trigram probe and both complete rungs ride broadcast hash
    joins; the per-doc reduction is one partial-aggregated groupBy.
    Since r12 the MODEL build computes its context totals as window
    sums over the generated (model-sized) tables — one pass instead
    of a groupBy + join-back that inlined the W^3 derivation twice —
    so windows are allowed strictly BELOW broadcast exchanges: every
    Window must sit inside a BroadcastExchange subtree, never on the
    corpus side."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    plan = backoff_lm_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # corpus-side window check: strip every broadcast-build subtree
    # (model tables) by indentation — the remaining lines are the
    # probe/aggregate spine and must carry no Window.
    lines = plan.splitlines()
    spine: list[str] = []
    skip_indent: int | None = None
    for ln in lines:
        body = ln.lstrip(" :+-*")
        indent = len(ln) - len(body)
        if skip_indent is not None and indent > skip_indent:
            continue
        skip_indent = None
        if body.startswith("BroadcastExchange"):
            skip_indent = indent
            continue
        spine.append(body)
    assert not any(s.startswith("Window") for s in spine), spine
