"""Bucketed co-located join: the fact⋈fact join must plan with NO
shuffle exchange when both sides are bucketed on the key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.plans import audit as pa
from geoscale_healthflow_etl_django_analytics_spark.sources import bucketing
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_cobucketed_join_has_no_exchange(spark):
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"
    ).select("okey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, SF, "orders").withColumnRenamed(
        "o_orderkey", "okey"
    ).select("okey", "o_totalprice", "o_orderdate")

    bucketing.write_bucketed(li, "b_lineitem", "okey", n_buckets=8)
    bucketing.write_bucketed(orders, "b_orders", "okey", n_buckets=8)

    # at test scale Catalyst would broadcast (equally shuffle-free);
    # force the at-scale situation where neither fact side fits.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cobucketed_join(spark, "b_lineitem", "b_orders", "okey")
        plan = pa.simple_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    joined = bucketing.cobucketed_join(spark, "b_lineitem", "b_orders", "okey")

    # and the result is correct vs the plain join
    plain = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == plain
