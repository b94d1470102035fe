"""File-format sources & sinks — SURVEY.md §2.1 S1-S4, S9-S11.

S1 (CSV with encoding detection) is fully implemented: Spark's CSV
reader handles the parse distributed-side; encoding sniffing (the
reference reads the raw bytes through chardet,
`health_center_lab__data_upload_views.py:55-70`) happens on a bounded
prefix at the driver, which is exactly what chardet does.

S2 (Excel), S3 (shapefile-ZIP) and S4 (GeoTIFF polygonize) need
libraries absent from this container (openpyxl/geopandas/rasterio);
they are gated stubs with the real column contracts documented — the
ingest shape (file → rows with typed geometry/feature columns) is
what downstream operators consume.

S9/S10 (Mongo/Elasticsearch sinks) are connector-format writes whose
jars are not present; S11 (JSON export) is native.
"""

from __future__ import annotations

import codecs

from pyspark.sql import DataFrame, SparkSession

_BOM_TO_ENCODING = (
    (codecs.BOM_UTF8, "UTF-8"),
    (codecs.BOM_UTF16_LE, "UTF-16LE"),
    (codecs.BOM_UTF16_BE, "UTF-16BE"),
)


def sniff_encoding(path: str, sample_bytes: int = 64 * 1024) -> str:
    """S1 — bounded-prefix encoding detection. Uses chardet when
    available (the reference's exact dependency); falls back to
    BOM + utf-8-vs-latin-1 probing."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    for bom, enc in _BOM_TO_ENCODING:
        if head.startswith(bom):
            return enc
    try:
        import chardet

        guess = chardet.detect(head)
        if guess.get("encoding"):
            return guess["encoding"]
    except ImportError:
        pass
    try:
        head.decode("utf-8")
        return "UTF-8"
    except UnicodeDecodeError:
        return "ISO-8859-1"


def read_csv(
    spark: SparkSession,
    path: str,
    encoding: str | None = None,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """S1 — CSV scan with encoding sniff
    (health_center_lab__data_upload_views.py:55-70 and two siblings).
    Schema-on-read like the reference: whatever columns arrive are
    kept; the tolerant alias resolution happens downstream
    (sources/semantic.py-style coalesce chains)."""
    enc = encoding or sniff_encoding(path)
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("encoding", enc)
        .csv(path)
    )


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """S2 — Excel scan (health_center_lab__data_upload_views.py:72-73).
    Needs a reader library (com.crealytics.spark.excel on-cluster, or
    pandas+openpyxl driver-side for small files)."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:
        raise NotImplementedError(
            "S2 Excel scan requires openpyxl (absent in this container); "
            "contract: file -> DataFrame with header row as columns"
        ) from e
    return spark.createDataFrame(pd.read_excel(path))


def read_shapefile_zip(spark: SparkSession, path: str) -> DataFrame:
    """S3 — shapefile-ZIP scan (country_adm_boundaries_upload_views.py:
    31-112): unzip, pick the best .shp, read features. Contract:
    file -> rows of (feature properties..., geometry WKT string).
    Requires geopandas/pyshp (absent)."""
    raise NotImplementedError(
        "S3 shapefile ingest requires geopandas/pyshp; rows = features "
        "with WKT geometry + property columns"
    )


def read_geotiff_polygons(spark: SparkSession, path: str) -> DataFrame:
    """S4 — GeoTIFF scan + polygonize (SlopeGeoJsonUploadView.py:
    195-321): read band, vectorize to (geometry, value) rows, clip +
    simplify. Requires rasterio (absent). The downstream zonal-stats
    consumer is operators/geo.py::zonal_stats."""
    raise NotImplementedError(
        "S4 raster polygonize requires rasterio; rows = (geometry WKT, "
        "pixel value) per vectorized region"
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 — JSON/GeoJSON-lines export (batch_processor.py:497-556)."""
    df.write.mode(mode).json(path)


def write_mongo(df: DataFrame, uri: str, collection: str) -> None:
    """S9 — Mongo batch sink (mongo_saver.py:136-218). Needs the
    mongo-spark connector on the classpath."""
    raise NotImplementedError(
        'S9: df.write.format("mongodb").option("connection.uri", uri)'
        '.option("collection", collection) — connector jar not present'
    )


def write_elasticsearch(df: DataFrame, nodes: str, index: str) -> None:
    """S10 — Elasticsearch geo sink (geoJson_slope_etl_view.py:62-113).
    Needs elasticsearch-hadoop on the classpath."""
    raise NotImplementedError(
        'S10: df.write.format("es").option("es.nodes", nodes) — '
        "connector jar not present"
    )
