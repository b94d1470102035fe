"""Tier-1 exact-value tests on the analytic operators — the same
literal expectations as the reference's
tests/test_analytics_calculator.py:13-108 (5-row fixture: 2023 →
total 3 / positive 2 / 66.67; Male-2023 → 100.0; Village A 2023 →
50.0; summary overall 40.0, villages_count 3; empty → empty)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import health_analytics as ha

SCHEMA = (
    "year int, month int, day int, gender string, village string, "
    "district string, sector string, test_result string, is_positive int, "
    "age_group string"
)

ROWS = [
    (2023, 6, 1, "Male", "Village A", "d1", "s1", "Positive", 1, "25-44"),
    (2023, 6, 2, "Female", "Village A", "d1", "s1", "Negative", 0, "5-14"),
    (2023, 7, 3, "Female", "Village B", "d1", "s2", "Positive", 1, "25-44"),
    (2022, 3, 4, "Female", "Village C", "d2", "s3", "Negative", 0, "65+"),
    (2022, 5, 5, "Male", "Village C", "d2", "s3", "Negative", 0, "25-44"),
]


@pytest.fixture(scope="module")
def lab(spark):
    return spark.createDataFrame(ROWS, schema=SCHEMA)


def test_yearly_2023(lab):
    r = {row["year"]: row for row in ha.yearly_slide_status(lab).collect()}
    assert r[2023]["total_tests"] == 3
    assert r[2023]["positive_cases"] == 2
    assert r[2023]["negative_cases"] == 1
    assert r[2023]["inconclusive_cases"] == 0
    assert r[2023]["positivity_rate"] == 66.67
    assert r[2022]["positivity_rate"] == 0.0


def test_gender_male_2023(lab):
    rows = {
        (r["year"], r["gender"]): r for r in ha.gender_positivity(lab).collect()
    }
    assert rows[(2023, "Male")]["positivity_rate"] == 100.0
    assert rows[(2023, "Female")]["positivity_rate"] == 50.0


def test_village_a_2023(lab):
    rows = {
        (r["village"], r["year"]): r
        for r in ha.village_positivity(lab).collect()
    }
    a = rows[("Village A", 2023)]
    assert a["total_tests"] == 2
    assert a["positive_cases"] == 1
    assert a["negative_cases"] == 1
    assert a["positivity_rate"] == 50.0
    assert a["district"] == "d1" and a["sector"] == "s1"


def test_monthly(lab):
    rows = {
        (r["year"], r["month"]): r for r in ha.monthly_positivity(lab).collect()
    }
    assert rows[(2023, 6)]["total_tests"] == 2
    assert rows[(2023, 6)]["positivity_rate"] == 50.0
    assert rows[(2023, 6)]["month_name"] == "June"
    assert rows[(2023, 7)]["positivity_rate"] == 100.0


def test_summary(lab):
    s = ha.total_summary(lab).collect()[0]
    assert s["total_records"] == 5
    assert s["total_positive"] == 2
    assert s["overall_positivity_rate"] == 40.0
    assert s["villages_count"] == 3
    assert s["earliest_year"] == 2022 and s["latest_year"] == 2023
    assert s["years_covered"] == "2022,2023"
    assert s["male_count"] == 2 and s["female_count"] == 3
    # reference A5's value_counts().to_dict() breakdowns, key-sorted JSON
    assert s["gender_breakdown"] == '{"Female":3,"Male":2}'
    assert s["age_group_breakdown"] == '{"25-44":3,"5-14":1,"65+":1}'


def test_empty_input(spark):
    empty = spark.createDataFrame([], schema=SCHEMA)
    assert ha.yearly_slide_status(empty).count() == 0
    assert ha.gender_positivity(empty).count() == 0
    assert ha.village_positivity(empty).count() == 0
    assert ha.monthly_positivity(empty).count() == 0
