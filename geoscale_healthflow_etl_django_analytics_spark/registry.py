"""Query registry: every implemented operator from SURVEY.md §2 as a
(name → Spark builder, DuckDB oracle SQL) pair.

The driver contract (`__spark_entry__.py`) is generated from this
registry. Conventions that keep the value-hash comparison exact:

- Every computed column is aliased IDENTICALLY in builder and oracle.
- Counts are BIGINT on both sides (DuckDB ``sum(int)`` → HUGEINT is
  always cast to BIGINT).
- DuckDB ``year()``/``month()`` return BIGINT → cast to INTEGER to
  match Spark.
- Ratios/averages are ``round(x, 2..6)`` on both sides (double sums
  are order-dependent in the last bits; rounding removes that).
- DuckDB ``CAST(double AS INT)`` rounds, Spark truncates → oracles
  use ``trunc()`` where C2 semantics apply.
- LIMIT queries order by a deterministic unique key chain.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .functions.cleaning import MONTH_NAMES
from .sources import catalog
from .sources import semantic

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # part of the bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, bench=bench, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def _lab(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semantic.lab_records(catalog.load_table(spark, sf_dir, "events"))


# SQL fragment: month number → English name (mirrors cleaning.month_name)
MONTH_NAME_SQL = (
    "CASE month "
    + " ".join(f"WHEN {n} THEN '{name}'" for n, name in MONTH_NAMES.items())
    + " ELSE 'Unknown' END"
)


# ===========================================================================
# Health analytics suite — SURVEY.md §2.5 (A1-A5), §2.7 (O3), §2.5 (A10)
# ===========================================================================

from .operators import health_analytics as ha  # noqa: E402


@register(
    "hc_a1_yearly_slide_status",
    oracle=semantic.with_lab_cte("""
SELECT
    year,
    count(*) AS total_tests,
    CAST(sum(is_positive) AS BIGINT) AS positive_cases,
    CAST(sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END) AS BIGINT)
        AS negative_cases,
    CAST(count(*) - sum(is_positive)
         - sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END) AS BIGINT)
        AS inconclusive_cases,
    round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate,
    round(100.0 * sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END)
          / count(*), 2) AS negativity_rate,
    round(100.0 * (count(*) - sum(is_positive)
          - sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END))
          / count(*), 2) AS inconclusive_rate
FROM lab
GROUP BY year
"""),
    tags=("A1", "aggregation"),
    bench=True,
)
def hc_a1_yearly_slide_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.yearly_slide_status(_lab(spark, sf_dir))


@register(
    "hc_a2_gender_positivity",
    oracle=semantic.with_lab_cte("""
SELECT
    year,
    gender,
    count(*) AS total_tests,
    CAST(sum(is_positive) AS BIGINT) AS positive_cases,
    CAST(sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END) AS BIGINT)
        AS negative_cases,
    round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate
FROM lab
GROUP BY year, gender
"""),
    tags=("A2", "aggregation"),
)
def hc_a2_gender_positivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.gender_positivity(_lab(spark, sf_dir))


@register(
    "hc_a3_village_positivity",
    oracle=semantic.with_lab_cte("""
SELECT
    village,
    year,
    min(district) AS district,
    min(sector) AS sector,
    count(*) AS total_tests,
    CAST(sum(is_positive) AS BIGINT) AS positive_cases,
    CAST(count(*) - sum(is_positive) AS BIGINT) AS negative_cases,
    round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate
FROM lab
WHERE village IS NOT NULL AND trim(village) <> ''
GROUP BY village, year
"""),
    tags=("A3", "aggregation"),
    bench=True,
)
def hc_a3_village_positivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.village_positivity(_lab(spark, sf_dir))


@register(
    "hc_a4_monthly_positivity",
    oracle=semantic.with_lab_cte(f"""
SELECT
    year,
    month,
    {MONTH_NAME_SQL} AS month_name,
    count(*) AS total_tests,
    CAST(sum(is_positive) AS BIGINT) AS positive_cases,
    round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate
FROM lab
WHERE year IS NOT NULL AND month IS NOT NULL
GROUP BY year, month
"""),
    tags=("A4", "aggregation", "flagship"),
)
def hc_a4_monthly_positivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.monthly_positivity(_lab(spark, sf_dir))


@register(
    "hc_a4_daily_positivity",
    oracle=semantic.with_lab_cte("""
SELECT
    year,
    month,
    day,
    count(*) AS total_tests,
    CAST(sum(is_positive) AS BIGINT) AS positive_cases,
    round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate
FROM lab
GROUP BY year, month, day
"""),
    tags=("A4", "aggregation"),
    bench=True,
)
def hc_a4_daily_positivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.daily_positivity(_lab(spark, sf_dir))


@register(
    "hc_a5_total_summary",
    oracle=semantic.with_lab_cte("""
SELECT
    count(*) AS total_records,
    CAST(sum(is_positive) AS BIGINT) AS total_positive,
    CAST(sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END) AS BIGINT)
        AS total_negative,
    CAST(count(*) - sum(is_positive)
         - sum(CASE WHEN test_result = 'Negative' THEN 1 ELSE 0 END) AS BIGINT)
        AS total_inconclusive,
    CASE WHEN count(*) > 0
         THEN round(100.0 * sum(is_positive) / count(*), 2) ELSE 0.0 END
        AS overall_positivity_rate,
    min(year) AS earliest_year,
    max(year) AS latest_year,
    array_to_string(list_sort(list(DISTINCT year)), ',') AS years_covered,
    count(DISTINCT district) AS districts_count,
    count(DISTINCT sector) AS sectors_count,
    count(DISTINCT village) AS villages_count,
    array_to_string(list_sort(list(DISTINCT district)), ',') AS districts,
    array_to_string(list_sort(list(DISTINCT sector)), ',') AS sectors,
    CAST(sum(CASE WHEN gender = 'Male' THEN 1 ELSE 0 END) AS BIGINT) AS male_count,
    CAST(sum(CASE WHEN gender = 'Female' THEN 1 ELSE 0 END) AS BIGINT) AS female_count,
    CAST(sum(CASE WHEN gender = 'Unknown' THEN 1 ELSE 0 END) AS BIGINT)
        AS unknown_gender_count
FROM lab
"""),
    tags=("A5", "aggregation"),
)
def hc_a5_total_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.total_summary(_lab(spark, sf_dir))


@register(
    "hc_o3_top20_villages",
    oracle=semantic.with_lab_cte("""
SELECT * FROM (
    SELECT
        village,
        year,
        min(district) AS district,
        min(sector) AS sector,
        count(*) AS total_tests,
        CAST(sum(is_positive) AS BIGINT) AS positive_cases,
        CAST(count(*) - sum(is_positive) AS BIGINT) AS negative_cases,
        round(100.0 * sum(is_positive) / count(*), 2) AS positivity_rate
    FROM lab
    WHERE village IS NOT NULL AND trim(village) <> ''
    GROUP BY village, year
) t
ORDER BY positivity_rate DESC, village ASC, year ASC
LIMIT 20
"""),
    tags=("O3", "topk"),
)
def hc_o3_top20_villages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.top_villages_by_positivity(_lab(spark, sf_dir), k=20)


@register(
    "hc_a10_distinct_years",
    oracle=semantic.with_lab_cte("""
SELECT DISTINCT year
FROM lab
WHERE year BETWEEN 2015 AND 2030
"""),
    tags=("A10", "distinct"),
)
def hc_a10_distinct_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ha.distinct_years(_lab(spark, sf_dir))
