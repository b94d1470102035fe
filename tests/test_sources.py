"""S1 CSV scan with encoding sniff, S11 JSON export, gated stubs,
J10 CRS diagnosis."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from geoscale_healthflow_etl_django_analytics_spark.operators.geo import diagnose_crs_overlap
from geoscale_healthflow_etl_django_analytics_spark.sources import files as fsrc


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="hf-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_s1_csv_utf8(spark, tmpdir):
    p = f"{tmpdir}/a.csv"
    with open(p, "w", encoding="utf-8") as f:
        f.write("district,cases\nKigali,10\nButare,5\n")
    df = fsrc.read_csv(spark, p)
    rows = {r.district: r.cases for r in df.collect()}
    assert rows == {"Kigali": 10, "Butare": 5}


def test_s1_csv_latin1_sniff(spark, tmpdir):
    p = f"{tmpdir}/b.csv"
    with open(p, "w", encoding="ISO-8859-1") as f:
        f.write("name,v\nCafé,1\nNuméro,2\n")
    enc = fsrc.sniff_encoding(p)
    assert enc in ("ISO-8859-1", "windows-1252", "Windows-1252")
    df = fsrc.read_csv(spark, p)
    names = {r.name for r in df.collect()}
    assert names == {"Café", "Numéro"}


def test_s1_csv_bom(tmpdir):
    p = f"{tmpdir}/c.csv"
    with open(p, "wb") as f:
        f.write(b"\xef\xbb\xbfx,y\n1,2\n")
    assert fsrc.sniff_encoding(p) == "UTF-8"


def test_s11_json_export(spark, tmpdir):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    fsrc.write_json(df, f"{tmpdir}/out")
    back = spark.read.json(f"{tmpdir}/out")
    assert back.count() == 2


def test_gated_stubs(spark):
    # S9/S10 stay gated on connector jars; S4 went real in
    # sources/geotiff.py but compressed rasters still raise
    for fn, args in [
        (fsrc.write_mongo, (None, "uri", "c")),
        (fsrc.write_elasticsearch, (None, "n", "i")),
    ]:
        with pytest.raises(NotImplementedError):
            fn(*args)

    import struct as _s
    import tempfile

    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    # LZW (5), JPEG (7) and deflate (8) decode natively now (r5 added
    # the baseline-JPEG codec); an unknown code must still raise with
    # the supported list
    unk = bytearray(gt.write_geotiff_bytes(1, 1, [0.0]))
    n = _s.unpack_from("<H", unk, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if _s.unpack_from("<H", unk, base)[0] == 259:
            _s.pack_into("<H", unk, base + 8, 34712)  # JPEG2000 — unsupported
    with tempfile.NamedTemporaryFile(suffix=".tif") as f:
        f.write(bytes(unk))
        f.flush()
        with pytest.raises(ValueError, match="unsupported TIFF compression"):
            fsrc.read_geotiff_pixels(spark, f.name)


def test_j10_crs_overlap():
    rwanda_wgs84 = (28.8, -2.9, 30.9, -1.0)
    candidates = {
        "EPSG:32735": (100000.0, 9600000.0, 900000.0, 10000000.0),
        "EPSG:4326": (-180.0, -90.0, 180.0, 90.0),
    }
    assert diagnose_crs_overlap(rwanda_wgs84, candidates) == "EPSG:4326"
    assert (
        diagnose_crs_overlap((5e5, 97e5, 6e5, 98e5), candidates) == "EPSG:32735"
    )
    assert diagnose_crs_overlap((1e9, 1e9, 2e9, 2e9), candidates) is None


def test_rolling_hash_order_sensitivity(spark):
    from pyspark.sql import functions as F

    from geoscale_healthflow_etl_django_analytics_spark.functions.text import rolling_hash

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.h for r in df.select("doc_id", rolling_hash(F.col("text")).alias("h")).collect()}
    assert out[1] == out[2]       # identical sequence -> identical hash
    assert out[1] != out[3]       # permuted sequence -> different hash
    assert all(0 <= v < 2147483647 for v in out.values())


def test_staging_readback_partition_pruning(spark, tmpdir):
    """The dynamic-table-names -> partition-columns mapping must pay
    off as partition pruning on read-back."""
    from pyspark.sql import functions as F

    from geoscale_healthflow_etl_django_analytics_spark.operators import staging
    from geoscale_healthflow_etl_django_analytics_spark.plans import audit as pa
    from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    for d in ("gasabo", "bugesera"):
        staging.write_staging(
            df, tmpdir, "stg", filter_district=d, mode="append"
        )
    back = spark.read.parquet(f"{tmpdir}/stg").filter(
        F.col("filter_district") == "gasabo"
    )
    plan = pa.formatted_plan(back)
    assert "PartitionFilters" in plan and "filter_district" in plan
    assert back.select("filter_district").distinct().count() == 1
