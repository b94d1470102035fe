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


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by_cols: list[str],
    carry_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, the most recent right
    row with the same ``by_cols`` key and ``time <= left.time`` (ties
    at equal time match, like DuckDB's ASOF ``>=``). Left rows with no
    earlier right row survive with nulls (ASOF LEFT semantics).

    Spark has no ASOF JOIN; the textbook escape hatch is cogrouped
    ``applyInPandas`` + ``merge_asof``, which drags every row through
    Python. This is the DataFrame-native formulation instead: tag both
    sides, UNION them, and carry the right side's payload forward with
    ``last(ignoreNulls)`` over a per-key time-ordered window — ONE
    shuffle on the key, no join, no Python, no range explosion. At
    100 TB the cost is the same per-key sort a shuffled range join
    would need, minus the probe-side build.

    Equal-time ties order the right row FIRST (side 0 < side 1) so a
    left row at the same instant sees it. Within-side duplicate
    (key, time) right rows would make the carried value order-
    dependent — callers must dedupe those (the registered query's
    corpus is duplicate-free and the oracle's native ASOF has the
    same ambiguity).
    """
    from pyspark.sql import Window

    carried = [f"__carry_{c}" for c in carry_cols]
    r_tag = right.select(
        *by_cols,
        F.col(time_col).alias(time_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(cc) for c, cc in zip(carry_cols, carried)],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by_cols and c != time_col
        ],
    )
    l_tag = left.select(
        *by_cols,
        time_col,
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(cc)
            for c, cc in zip(carry_cols, carried)
        ],
        *[c for c in left.columns if c not in by_cols and c != time_col],
    )
    unioned = r_tag.unionByName(l_tag)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(cc, ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c, cc in zip(carry_cols, carried)
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side", *carried)
