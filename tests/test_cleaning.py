"""Exact-value tests for the cleaning layer (SURVEY.md §2.3) —
mirrors the reference's unit expectations (helpers.py semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions import cleaning as C


def _apply(spark, values, fn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"x {in_type}")
    return [r[0] for r in df.select(fn(F.col("x")).alias("y")).collect()]


def test_clean_text(spark):
    out = _apply(spark, ["  hi ", "", None, "a b"], C.clean_text)
    assert out == ["hi", "", "", "a b"]


def test_clean_integer(spark):
    out = _apply(spark, ["3", "3.9", "-2.7", "x", None], C.clean_integer)
    assert out == [3, 3, -2, None, None]


def test_clean_gender(spark):
    out = _apply(
        spark,
        ["M", "male", " WOMAN ", "F", "fem", None, "123"],
        C.clean_gender,
    )
    assert out == ["Male", "Male", "Female", "Female", "Unknown", "Unknown", "Unknown"]


def test_categorize_age(spark):
    out = _apply(
        spark, [0, 4, 5, 14, 15, 24, 25, 44, 45, 64, 65, 99, None], C.categorize_age, "int"
    )
    assert out == [
        "Under 5", "Under 5", "5-14", "5-14", "15-24", "15-24",
        "25-44", "25-44", "45-64", "45-64", "65+", "65+", "Unknown",
    ]


def test_clean_age_bounds(spark):
    out = _apply(spark, ["25", "-1", "121", "abc", None], C.clean_age)
    assert out == [25, 30, 30, 30, 30]


def test_clean_month(spark):
    out = _apply(
        spark, ["1", "12", "0", "13", "March", "mar", "JUNE", "xyz", None], C.clean_month
    )
    assert out == [1, 12, None, None, 3, 3, 6, None, None]


def test_interpret_test_result_reference_semantics(spark):
    out = _apply(
        spark,
        [
            "POSITIVE", "pos", "+", "P.falciparum detected", "malaria",
            "NEGATIVE", "neg", "result - none", "CLEAN slide",
            "NO MALARIA",  # reference quirk: positive checked first
            "pending", "", None,
        ],
        C.interpret_test_result,
    )
    assert out == [
        "Positive", "Positive", "Positive", "Positive", "Positive",
        "Negative", "Negative", "Negative", "Negative",
        "Positive",
        "Inconclusive", "Unknown", "Unknown",
    ]


def test_api_and_risk(spark):
    df = spark.createDataFrame(
        [(0, 100), (5, 1000), (50, 1000), (100, 1000), (120, 1000), (10, 0)],
        schema="cases int, pop int",
    )
    rows = df.select(
        C.api_per_1000(F.col("cases"), F.col("pop")).alias("api"),
    ).withColumn("risk", C.who_risk_category(F.col("api"))).collect()
    assert [(r.api, r.risk) for r in rows] == [
        (0.0, "No Transmission"),
        (5.0, "Moderate"),  # Moderate band is [5, 50)
        (50.0, "High"),
        (100.0, "Very High"),
        (120.0, "Very High"),
        (0.0, "No Transmission"),
    ]


def test_slope_class(spark):
    out = _apply(spark, [0.0, 4.9, 5.0, 14.9, 15.0, 29.9, 30.0], C.slope_class, "double")
    assert out == ["Flat", "Flat", "Moderate", "Moderate", "Steep", "Steep", "Very Steep"]


def test_deterministic_id_stable(spark):
    df = spark.createDataFrame([(2023, 1, "Kigali")], "y int, m int, d string")
    a = df.select(C.deterministic_id(F.col("y"), F.col("m"), F.col("d")).alias("id")).collect()[0][0]
    b = df.select(C.deterministic_id(F.col("y"), F.col("m"), F.col("d")).alias("id")).collect()[0][0]
    assert a == b and len(a) == 32
