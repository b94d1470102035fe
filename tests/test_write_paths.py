"""Write-path operators: S7 overwrite, U4 partition replace, S12
delete, C14 dedup idempotence, F6 year parsing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions.params import (
    YearSpecError,
    parse_year_spec,
)
from geoscale_healthflow_etl_django_analytics_spark.operators import upsert as ups
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="hf-write-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_s7_overwrite(spark, tmpdir):
    df = load_table(spark, SF, "region")
    ups.overwrite_table(df, f"{tmpdir}/t")
    assert spark.read.parquet(f"{tmpdir}/t").count() == 5
    ups.overwrite_table(df.limit(3), f"{tmpdir}/t")
    assert spark.read.parquet(f"{tmpdir}/t").count() == 3


def test_u4_partition_overwrite(spark, tmpdir):
    ev = load_table(spark, SF, "events").withColumn(
        "day", F.dayofmonth("ts")
    ).select("event_id", "event_type", "day")
    ups.overwrite_partitions(ev, f"{tmpdir}/p", ["day"])
    before = spark.read.parquet(f"{tmpdir}/p").count()
    # replace ONLY day=1 with a single row; other partitions untouched
    one = spark.createDataFrame([(999999, "patch", 1)], "event_id long, event_type string, day int")
    ups.overwrite_partitions(one, f"{tmpdir}/p", ["day"])
    after = spark.read.parquet(f"{tmpdir}/p")
    day1 = after.filter(F.col("day") == 1)
    assert day1.count() == 1 and day1.first().event_type == "patch"
    assert after.filter(F.col("day") != 1).count() == before - load_table(
        spark, SF, "events"
    ).filter(F.dayofmonth("ts") == 1).count()


def test_s12_delete(spark):
    df = load_table(spark, SF, "orders")
    keys = [r.o_orderkey for r in df.limit(5).collect()]
    out = ups.delete_by_key(df, "o_orderkey", keys)
    assert out.count() == df.count() - 5
    assert out.filter(F.col("o_orderkey").isin(keys)).count() == 0


def test_c14_dedup_idempotent(spark):
    df = load_table(spark, SF, "events").select("event_id").limit(100)
    doubled = df.union(df)
    assert ups.dedup_by_id(doubled, "event_id").count() == 100


def test_f6_year_spec():
    avail = [2021, 2022, 2023]
    assert parse_year_spec("all", avail) == avail
    assert parse_year_spec(None, avail) == avail
    assert parse_year_spec("2021-2023", avail) == [2021, 2022, 2023]
    assert parse_year_spec("2021,2023", avail) == [2021, 2023]
    assert parse_year_spec("2022", avail) == [2022]
    with pytest.raises(YearSpecError):
        parse_year_spec("2024", avail)  # not available
    with pytest.raises(YearSpecError):
        parse_year_spec("1999", avail)  # out of bounds
    with pytest.raises(YearSpecError):
        parse_year_spec("20xx", avail)
    with pytest.raises(YearSpecError):
        parse_year_spec("2023-2021", avail)
