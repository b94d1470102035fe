"""BM25 retrieval (operators/retrieval.py::bm25_topk): hand-checkable
ranking semantics on a tiny corpus — idf favors rare terms, length
normalization penalizes long docs, non-matching docs never appear."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import retrieval as tx


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "rare common common common"),
            (2, "common common common common"),
            (3, "rare rare common filler filler filler filler filler"),
            (4, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )


def test_bm25_rare_term_outranks_common(spark):
    out = tx.bm25_topk(_corpus(spark), ["rare"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    # only docs containing "rare" are retrieved
    assert set(ids) == {1, 3}
    # doc 3 has tf=2 but is twice as long; doc 1 has tf=1 in a short
    # doc — saturation + length norm make doc 3 win (tf dominates at
    # these lengths), and both strictly positive
    assert all(r["bm25"] > 0 for r in out)
    assert out[0]["doc_id"] == 3 and out[0]["rank"] == 1


def test_bm25_multi_term_sums_and_counts(spark):
    out = {
        r["doc_id"]: r
        for r in tx.bm25_topk(_corpus(spark), ["rare", "common"], k=10).collect()
    }
    assert out[1]["n_matched_terms"] == 2
    assert out[2]["n_matched_terms"] == 1
    assert 4 not in out  # no query term at all
    # two-term doc beats the best single-term doc
    assert out[1]["bm25"] > out[2]["bm25"]


def test_bm25_k_truncates_with_deterministic_ties(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(1, 8)],
        "doc_id long, text string",
    )
    out = tx.bm25_topk(docs, ["same"], k=3).collect()
    # identical scores -> doc_id ascending tiebreak, exactly k rows
    assert [r["doc_id"] for r in out] == [1, 2, 3]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_bm25_plan_broadcasts_query_side(spark):
    plan = tx.bm25_topk(_corpus(spark), ["rare"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
