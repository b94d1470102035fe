"""Incremental-ingest MinHash dedup (operators/incremental.py):
equivalence to the batch-restricted whole-corpus tier, link typing,
the no-old-pairs invariant, bucket-selection proportionality, and the
semi-join plan pin."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import dedup as dd
from geoscale_healthflow_etl_django_analytics_spark.operators.incremental import (
    incremental_minhash_pairs,
)
from geoscale_healthflow_etl_django_analytics_spark.plans import audit as pa
from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").withColumn(
        "is_new", F.col("doc_id") % 10 >= 8
    )


def _tagged(docs):
    """The operator's own two-sided flag construction (literal flags,
    no join), un-checkpointed so plans stay inspectable."""
    return (
        dd.minhash_perm_band_hashes(docs.filter("is_new"))
        .withColumn("__new", F.lit(True))
        .unionByName(
            dd.minhash_perm_band_hashes(docs.filter(~F.col("is_new")))
            .withColumn("__new", F.lit(False))
        )
    )


def test_matches_batch_restricted_whole_corpus(spark):
    """At gate SF the whole-corpus tier's salting is a literal 0, so
    the incremental output must equal the whole-corpus pair set
    restricted to pairs touching >= 1 batch doc — the incremental
    plan discovers exactly the pairs a full re-run would, minus the
    old x old work it exists to skip."""
    full = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dd.minhash_lsh_pairs(
            load_table(spark, SF, "documents"), threshold=0.8
        ).collect()
        if r["doc_a"] % 10 >= 8 or r["doc_b"] % 10 >= 8
    }
    inc = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in incremental_minhash_pairs(_docs(spark)).collect()
    }
    assert inc == full


def test_link_type_and_no_old_pairs(spark):
    rows = incremental_minhash_pairs(_docs(spark)).collect()
    assert rows, "gate corpus contains planted near-dups"
    for r in rows:
        new_a, new_b = r["doc_a"] % 10 >= 8, r["doc_b"] % 10 >= 8
        assert new_a or new_b, r
        want = "batch_batch" if (new_a and new_b) else "batch_index"
        assert r["link_type"] == want, r


def test_touched_buckets_are_batch_proportional(spark):
    """The semi-join must select a strict subset of band rows — the
    whole point is that untouched buckets (no batch doc) never reach
    the pair expansion."""
    docs = _docs(spark)
    tagged = _tagged(docs)
    new_keys = tagged.filter("__new").select("band", "bh").distinct()
    touched = tagged.join(new_keys, ["band", "bh"], "left_semi").count()
    total = tagged.count()
    assert touched < total, (touched, total)


def test_bucket_selection_plan_pins_shuffle_hash(spark):
    """The batch key set grows with the batch (the scale curve grows
    the batch with the corpus), so the bucket-selecting semi-join must
    be a ShuffledHashJoin, never an AQE broadcast guess."""
    docs = _docs(spark)
    tagged = _tagged(docs)
    new_keys = tagged.filter("__new").select("band", "bh").distinct()
    touched = tagged.join(
        new_keys.hint("shuffle_hash"), ["band", "bh"], "left_semi"
    )
    plan = pa.formatted_plan(touched)
    assert "ShuffledHashJoin LeftSemi" in plan, plan
    # no joins anywhere upstream either: the two band-hash sides carry
    # literal flags, so no corpus-sized flag table can ride an AQE
    # broadcast guess
    assert "BroadcastExchange" not in plan, plan


def test_registered_query_shape(spark):
    df = REGISTRY["dedup_minhash_incremental"].builder(spark, SF)
    assert df.columns == ["doc_a", "doc_b", "jaccard", "link_type"]


def test_ingest_accept_invariants(spark):
    """The accept set must satisfy all three gate contracts: batch
    membership, exact-fingerprint uniqueness vs index and within the
    accepted set, and absence of every near-gate loser."""
    from geoscale_healthflow_etl_django_analytics_spark.functions.text import fingerprint
    from geoscale_healthflow_etl_django_analytics_spark.operators.incremental import (
        incremental_minhash_pairs,
    )

    docs = _docs(spark)
    accepted = {
        r["doc_id"]
        for r in REGISTRY["dedup_incremental_ingest"]
        .builder(spark, SF)
        .collect()
    }
    batch_ids = {
        r["doc_id"] for r in docs.filter("is_new").select("doc_id").collect()
    }
    assert accepted, "gate corpus must accept someone"
    assert accepted <= batch_ids
    assert len(accepted) < len(batch_ids), "planted dups must drop someone"

    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    index_fps = {fps[d] for d in fps if d % 10 < 8}
    accepted_fps = [fps[d] for d in sorted(accepted)]
    assert not (set(accepted_fps) & index_fps)
    assert len(accepted_fps) == len(set(accepted_fps))

    for r in incremental_minhash_pairs(docs, threshold=0.8).collect():
        a, b = r["doc_a"], r["doc_b"]
        loser = (
            b
            if (a % 10 >= 8 and b % 10 >= 8)
            else (a if a % 10 >= 8 else b)
        )
        assert loser not in accepted, (a, b, loser)
