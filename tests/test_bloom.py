"""Bloom-filter pre-screening (functions/bloom.py) — no false
negatives ever, measured selectivity, tier output identity, and the
physical-plan contract (exactly two constant-size broadcasts — the
one-row dense bitmap and the pinned packed-words fill side — plus
shuffle-hash verify)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions import bloom as bl
from geoscale_healthflow_etl_django_analytics_spark.plans import audit as pa
from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

SF = "/root/testdata/sf0.001"


def test_no_false_negatives(spark):
    """Every inserted gram must probe True — the Bloom guarantee the
    exact-verify design depends on (a false negative would silently
    drop a true contamination match)."""
    grams = spark.range(0, 2000).select(
        F.concat(F.lit("gram-"), F.col("id")).alias("gram")
    )
    bitmap = bl.bloom_bitmap(grams)
    misses = (
        grams.crossJoin(F.broadcast(bitmap))
        .filter(~bl.bloom_contains(F.col("gram"), F.col("bloom")))
        .count()
    )
    assert misses == 0


def test_false_positive_rate_within_design(spark):
    """Non-inserted keys pass at roughly the designed rate — under 2%
    at 2k inserted grams against the 2^20/7 default (design point is
    <1% at 100k grams; the margin here is generous on purpose, the
    test pins the mechanism, not the third decimal)."""
    inserted = spark.range(0, 2000).select(
        F.concat(F.lit("in-"), F.col("id")).alias("gram")
    )
    probes = spark.range(0, 20000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("gram")
    )
    bitmap = bl.bloom_bitmap(inserted)
    fp = (
        probes.crossJoin(F.broadcast(bitmap))
        .filter(bl.bloom_contains(F.col("gram"), F.col("bloom")))
        .count()
    )
    assert fp / 20000 < 0.02, fp


def test_bitmap_is_constant_size(spark):
    """The dense word array is EXACTLY m_bits/64 entries regardless of
    insert count — the constant-broadcast contract (128 KiB at the
    default) that makes the tier corpus-independent, and the density
    the O(1) element_at probe depends on."""
    grams = spark.range(0, 50000).select(
        F.concat(F.lit("g-"), F.col("id")).alias("gram")
    )
    row = bl.bloom_bitmap(grams).collect()[0]
    assert len(row["bloom"]) == bl.BLOOM_M_BITS // 64


def test_bloom_tier_output_identical_to_exact(spark):
    """Third decontamination tier, same answer: Bloom false positives
    are retired by the exact verify join, so output is row-identical
    to the broadcast tier (and both share one oracle)."""
    a = {
        tuple(r)
        for r in REGISTRY["dedup_decontaminate"].builder(spark, SF).collect()
    }
    b = {
        tuple(r)
        for r in REGISTRY["dedup_decontaminate_bloom"]
        .builder(spark, SF)
        .collect()
    }
    assert a == b


def test_bloom_tier_plan_contract(spark):
    """Exactly TWO BroadcastExchanges, both constant-size by
    construction (the one-row bitmap and the <= m/64-row packed-words
    side of the dense-array fill join, pinned with an explicit
    broadcast() so it can never regress to a shuffle under unknown
    stats) — never the eval gram set or any corpus-sized table — and
    shuffle-hash pins on both the verify join and the per-doc left
    join, mirroring the semijoin tier's AQE-abort lesson."""
    import re

    plan = pa.formatted_plan(
        REGISTRY["dedup_decontaminate_bloom"].builder(spark, SF)
    )
    # formatted plans list each node twice (tree + details) — count
    # unique node ids, not raw substring occurrences
    assert len(set(re.findall(r"\((\d+)\) BroadcastExchange", plan))) == 2, plan
    assert len(set(re.findall(r"\((\d+)\) ShuffledHashJoin", plan))) == 2, plan


def test_bloom_prescreen_cuts_gram_exchange(spark):
    """The point of the tier: the (doc_id, gram) distinct downstream
    of the Bloom probe must see far fewer rows than the full corpus
    gram explosion it replaces."""
    from geoscale_healthflow_etl_django_analytics_spark.functions.text import word_ngrams
    from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", word_ngrams(F.col("text"), 8).alias("g8")
    )
    is_bench = F.col("doc_id") % 17 == 0
    bgrams = (
        docs.filter(is_bench).select(F.explode("g8").alias("gram")).distinct()
    )
    bitmap = bl.bloom_bitmap(bgrams)
    train_grams = docs.filter(~is_bench).select(
        "doc_id", F.explode("g8").alias("gram")
    )
    total = train_grams.count()
    survivors = (
        train_grams.crossJoin(F.broadcast(bitmap))
        .filter(bl.bloom_contains(F.col("gram"), F.col("bloom")))
        .count()
    )
    assert survivors < total * 0.5, (survivors, total)


def test_bloom_plan_sizing():
    from geoscale_healthflow_etl_django_analytics_spark.functions.bloom import (
        BLOOM_M_BITS,
        BLOOM_M_CAP,
        bloom_plan,
    )

    assert bloom_plan(0) == BLOOM_M_BITS
    assert bloom_plan(50_000) == BLOOM_M_BITS  # real eval sets: floor
    # the measured x10 saturation case: ~1.2M grams must get >= 16n
    assert bloom_plan(1_200_000) >= 16 * 1_200_000
    # power of two, monotone, capped
    for n in (1, 10**5, 10**6, 10**7, 10**9):
        m = bloom_plan(n)
        assert m & (m - 1) == 0
        assert BLOOM_M_BITS <= m <= BLOOM_M_CAP
    assert bloom_plan(10**9) == BLOOM_M_CAP


def test_no_false_negatives_property(spark):
    """Hypothesis: for ARBITRARY unicode gram values (not just the
    ascii synthetics above), every inserted gram probes True — the
    hash path must be total over real text, including empty strings,
    surrogate-adjacent codepoints and whitespace-only grams."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.text(min_size=0, max_size=40),
            min_size=1,
            max_size=30,
            unique=True,
        )
    )
    def check(vals):
        grams = spark.createDataFrame([(v,) for v in vals], "gram string")
        bitmap = bl.bloom_bitmap(grams)
        misses = (
            grams.crossJoin(F.broadcast(bitmap))
            .filter(~bl.bloom_contains(F.col("gram"), F.col("bloom")))
            .count()
        )
        assert misses == 0

    check()
