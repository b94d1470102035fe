"""End-to-end pipeline tests (SURVEY.md §3 entry points): each ETL
runs extract→clean→analytics→staged-write and the staged outputs
carry the FIXTURES.md §7 filter-context + audit columns."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark import pipelines
from geoscale_healthflow_etl_django_analytics_spark.functions.params import YearSpecError

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="hf-pipe-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_health_center_etl_full(spark, outdir):
    res = pipelines.health_center_etl(spark, SF, outdir)
    assert res["status"] == "success"
    assert res["summary"]["total_records"] == 1000
    yearly = spark.read.parquet(res["tables"]["yearly_statistics"])
    # FIXTURES §7 staging shape: analytics columns + filter context
    for col in (
        "year", "total_tests", "positive_cases", "negative_cases",
        "positivity_rate", "filter_district", "filter_sector",
        "filter_years", "created_at",
    ):
        assert col in yearly.columns, col
    assert yearly.first().filter_district == "all"


def test_health_center_etl_filtered(spark, outdir):
    res = pipelines.health_center_etl(
        spark, SF, outdir, district="D0", years="2024"
    )
    assert res["years"] == [2024]
    v = spark.read.parquet(res["tables"]["village_positivity"])
    # F1 case-insensitive match: 'D0' matched district 'd0'
    assert {r.district for r in v.select("district").distinct().collect()} == {"d0"}
    assert v.first().filter_district == "d0"


def test_health_center_etl_bad_years(spark, outdir):
    with pytest.raises(YearSpecError):
        pipelines.health_center_etl(spark, SF, outdir, years="1999")


def test_weather_etl(spark, outdir):
    res = pipelines.weather_etl(spark, SF, outdir)
    df = spark.read.parquet(res["table"])
    assert res["n_stations"] == 3
    assert df.count() == 36  # 3 stations x 12 scaffold months
    # fill ladder: station st2 has no thermometer -> 20.0 default
    st2 = df.filter((F.col("station") == "st2") & (~F.col("has_temp_data")))
    assert st2.count() == 12
    assert {r.temperature for r in st2.collect()} == {20.0}


def test_api_calculator_etl(spark, outdir):
    res = pipelines.api_calculator_etl(spark, SF, outdir)
    df = spark.read.parquet(res["table"])
    assert df.count() > 0
    assert "risk_category" in df.columns
    assert res["summary"]["total_cases"] == 1500
