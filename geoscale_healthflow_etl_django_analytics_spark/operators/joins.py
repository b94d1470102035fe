"""Join operators — SURVEY.md §2.4 (J3 semi, J9 equi chains), §2.7
(O4/O5 limits, F5 fuzzy fallback), §2.8 (U1 unionByName).

Strategy notes (what Catalyst does with these at scale, verified via
.explain): dimension tables (region/nation/customer at our ratios)
broadcast-hash-join against the fact side; the revenue chain keeps
one shuffle per fact aggregation; semi joins never materialize the
probe side's payload columns.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import exact_sum


def orders_for_segment_semi(orders: DataFrame, customer: DataFrame, segment: str) -> DataFrame:
    """J3 — metadata→data semi-join shape: only orders whose customer
    matches the filter are scanned further
    (weather_data_prec_temp_etl_view.py:278-316 classifies collections
    by metadata before opening them). left_semi keeps no customer
    columns → minimal shuffle payload."""
    seg_customers = customer.filter(F.col("c_mktsegment") == segment)
    return (
        orders.join(seg_customers, orders.o_custkey == seg_customers.c_custkey, "left_semi")
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            F.count("*").alias("order_count"),
            exact_sum(F.col("o_totalprice"), 2).alias("total_value"),
        )
    )


def revenue_by_nation_year(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str | None = None,
) -> DataFrame:
    """J9 — the dashboard's implicit location equi-join chain
    (analytics_dashboard/views.py:30-92): fact ⋈ fact ⋈ dims on
    shared keys, aggregated per (nation, year). Dim joins broadcast."""
    n = nation
    if region_name is not None:
        n = nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        )
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n), customer.c_nationkey == n.n_nationkey)
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").alias("year")
    ).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("lineitem_count"),
    )


def fuzzy_name_fallback(customer: DataFrame, pattern: str, limit: int = 10) -> DataFrame:
    """F5 — contains-match fallback with a suggestion cap
    (village_admin_boundaries_etl_view.py:152-171). Deterministic
    order by key so LIMIT is oracle-stable; Catalyst executes
    orderBy+limit as TakeOrderedAndProject."""
    return (
        customer.filter(F.col("c_name").contains(pattern))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(limit)
    )


def union_collections(dfs: list[DataFrame]) -> DataFrame:
    """U1 — union of per-collection scans whose schemas drifted
    (health_center_mongodb_service.py:158-222 unions Mongo cursors
    whose documents have different fields): unionByName with
    allowMissingColumns fills absent columns with null."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
    )


def location_hierarchy(region: DataFrame, nation: DataFrame) -> DataFrame:
    """A9/O2 — sorted distinct location hierarchy
    (malaria_api_calculator_etl_view.py:211-270): region → nation
    pairs, distinct, ordered. The nesting into a dict is presentation,
    not data-plane."""
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("region", "nation")
    )
