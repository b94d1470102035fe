"""Bigram LM scoring (operators/retrieval.py::bigram_lm_scores):
predictable-text docs score lower NLL than novel-text docs; short
docs drop; smoothing keeps unseen-context math finite."""

from __future__ import annotations

import math

from geoscale_healthflow_etl_django_analytics_spark.operators import retrieval as tx


def test_bigram_lm_prefers_repetitive_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b a b"),  # one dominant bigram pattern
            (2, "c d e f g h i j k l"),  # every bigram unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.bigram_lm_scores(docs).collect()}
    assert out[1]["mean_nll"] < out[2]["mean_nll"]
    assert out[1]["perplexity"] < out[2]["perplexity"]
    # perplexity is exp(mean_nll) of the rounded mean
    for r in out.values():
        assert abs(r["perplexity"] - round(math.exp(r["mean_nll"]), 4)) < 1e-9


def test_bigram_lm_drops_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    out = tx.bigram_lm_scores(docs).collect()
    assert [r["doc_id"] for r in out] == [3]
    assert out[0]["n_bigrams"] == 1


def test_bigram_lm_probabilities_normalized(spark):
    """With add-k smoothing, sum over observed continuations of an
    observed context is < 1 (mass reserved for unseen) and every
    per-bigram probability is in (0, 1)."""
    docs = spark.createDataFrame(
        [(1, "x y x z x y")], "doc_id long, text string"
    )
    row = tx.bigram_lm_scores(docs).collect()[0]
    # 5 bigrams, all probabilities < 1 -> mean_nll strictly positive
    assert row["n_bigrams"] == 5
    assert row["mean_nll"] > 0
