"""Semantic layer: the reference's domain model over the test schema.

The reference computes over malaria lab records (year, month, gender,
village, district, sector, test_result) and weather station readings
(station, year, month, precipitation, temperature). The driver's
synthetic star schema has no such columns, so this module defines a
DETERMINISTIC mapping from `events` onto those domain shapes, used by
both the Spark operators and the DuckDB oracle SQL (the `LAB_CTE` /
weather CTE strings below are the single source of truth for the
oracle side — every oracle query is prefixed with them).

Mapping (pure arithmetic on stable keys → identical in any engine):
- year/month/day       from `ts` (calendar, UTC).
- gender               user_id % 3 → Male / Female / Unknown.
- village              'v' + zero-padded user_id % 50.
- district             'd' + user_id % 5   (functional: (u%50)%5).
- sector               's' + user_id % 10  (functional: (u%50)%10).
- station              'st' + user_id % 3.
- test_result          event_type: purchase → Positive,
                       error|click → Negative, else Inconclusive
                       (the C7 keyword interpreter's output domain).
- is_positive          test_result == Positive (C8).
- age                  user_id % 90 + 1 (1..90, covers every C4
                       bucket); age_group = C4 categorize_age(age).

Weather series (SURVEY.md §2.4 J1/J2): 'precip' readings are `value`
on click events; 'temp' readings are `value` on view events from
stations st0/st1 only — st2 has no thermometer, so the 20.0 default
leg of the reference's fill ladder is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import categorize_age

# --------------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------------


def lab_records(events: DataFrame) -> DataFrame:
    """The canonical 17-ish-field lab record (data_transformer.py:40-94
    composed of C1-C8) over the events feed."""
    u = F.col("user_id")
    test_result = (
        F.when(F.col("event_type") == "purchase", "Positive")
        .when(F.col("event_type").isin("error", "click"), "Negative")
        .otherwise("Inconclusive")
    )
    return events.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("ts"),
        F.col("event_type"),
        F.col("value"),
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.when(u % 3 == 0, "Male")
        .when(u % 3 == 1, "Female")
        .otherwise("Unknown")
        .alias("gender"),
        F.concat(F.lit("v"), F.lpad((u % 50).cast("string"), 2, "0")).alias(
            "village"
        ),
        F.concat(F.lit("d"), (u % 5).cast("string")).alias("district"),
        F.concat(F.lit("s"), (u % 10).cast("string")).alias("sector"),
        F.concat(F.lit("st"), (u % 3).cast("string")).alias("station"),
        test_result.alias("test_result"),
        (test_result == "Positive").cast("int").alias("is_positive"),
        (u % 90 + 1).cast("int").alias("age"),
        categorize_age((u % 90 + 1).cast("int")).alias("age_group"),
    )


def precip_readings(events: DataFrame) -> DataFrame:
    """Precipitation series: click events (station, year, month, PRECIP)."""
    lab = lab_records(events)
    return lab.filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull() & (F.col("value") >= 0)
    ).select("station", "year", "month", F.col("value").alias("precip"))


def temp_readings(events: DataFrame) -> DataFrame:
    """Temperature series: view events from stations st0/st1 only."""
    lab = lab_records(events)
    return lab.filter(
        (F.col("event_type") == "view")
        & (F.col("user_id") % 3 != 2)
        & F.col("value").between(-50, 1000)
    ).select("station", "year", "month", F.col("value").alias("temp"))


# --------------------------------------------------------------------------
# DuckDB oracle side — keep in lockstep with the builders above.
# Note engine-parity rules used throughout the oracle SQL:
#  * year()/month() return BIGINT in DuckDB → cast to INTEGER.
#  * SUM(int) returns HUGEINT in DuckDB → cast to BIGINT.
#  * DuckDB CAST(double AS INT) rounds; Spark truncates → use trunc().
# --------------------------------------------------------------------------

LAB_CTE = """
lab AS (
    SELECT
        event_id,
        user_id,
        ts,
        event_type,
        value,
        CAST(year(ts) AS INTEGER)  AS year,
        CAST(month(ts) AS INTEGER) AS month,
        CAST(day(ts) AS INTEGER)   AS day,
        CASE CAST(user_id % 3 AS INTEGER)
            WHEN 0 THEN 'Male' WHEN 1 THEN 'Female' ELSE 'Unknown'
        END AS gender,
        'v' || lpad(CAST(user_id % 50 AS VARCHAR), 2, '0') AS village,
        'd' || CAST(user_id % 5 AS VARCHAR)  AS district,
        's' || CAST(user_id % 10 AS VARCHAR) AS sector,
        'st' || CAST(user_id % 3 AS VARCHAR) AS station,
        CASE
            WHEN event_type = 'purchase' THEN 'Positive'
            WHEN event_type IN ('error', 'click') THEN 'Negative'
            ELSE 'Inconclusive'
        END AS test_result,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_positive,
        CAST(user_id % 90 + 1 AS INTEGER) AS age,
        CASE
            WHEN user_id % 90 + 1 < 5  THEN 'Under 5'
            WHEN user_id % 90 + 1 < 15 THEN '5-14'
            WHEN user_id % 90 + 1 < 25 THEN '15-24'
            WHEN user_id % 90 + 1 < 45 THEN '25-44'
            WHEN user_id % 90 + 1 < 65 THEN '45-64'
            ELSE '65+'
        END AS age_group
    FROM events
)
"""

PRECIP_CTE = """
precip_r AS (
    SELECT station, year, month, value AS precip
    FROM lab
    WHERE event_type = 'click' AND value IS NOT NULL AND value >= 0
)
"""

TEMP_CTE = """
temp_r AS (
    SELECT station, year, month, value AS temp
    FROM lab
    WHERE event_type = 'view' AND user_id % 3 <> 2
      AND value BETWEEN -50 AND 1000
)
"""


def with_lab_cte(body: str) -> str:
    return f"WITH {LAB_CTE.strip()}\n{body}"


def with_weather_ctes(body: str) -> str:
    return (
        f"WITH {LAB_CTE.strip()},\n{PRECIP_CTE.strip()},\n{TEMP_CTE.strip()}\n{body}"
    )
