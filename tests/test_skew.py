"""Salted aggregation/join correctness: results must equal the
unsalted equivalents on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions import skew


def _skewed_df(spark):
    # 90% of rows on one key
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("k"),
        (F.col("id") % 100).alias("v"),
    )


def test_salted_sum_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    saltedr = {
        r.k: (r.s, r.n)
        for r in skew.salted_sum(
            df,
            ["k"],
            {"s": F.sum("v"), "n": F.count("*")},
            n_salts=8,
        ).collect()
    }
    assert plain == saltedr


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([("hot", 1.5), ("cold", 2.5)], "k string, w double")
    plain = big.join(small, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
    saltedr = (
        skew.salted_join_small_side(big, small, ["k"], n_salts=4)
        .agg(F.sum(F.col("v") * F.col("w")))
        .collect()[0][0]
    )
    assert plain == saltedr


def test_salted_agg_min_max(spark):
    df = _skewed_df(spark)
    plain = {
        r.k: (r.lo, r.hi, r.s)
        for r in df.groupBy("k")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.sum("v").alias("s"))
        .collect()
    }
    saltedr = {
        r.k: (r.lo, r.hi, r.s)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "lo": (F.min("v"), F.min),
                "hi": (F.max("v"), F.max),
                "s": (F.sum("v"), F.sum),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == saltedr
