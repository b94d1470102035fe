"""C19 — Transverse Mercator (UTM) reprojection correctness: known
invariants of the projection, roundtrip identity to sub-micrometer,
and the reference's sample-point CRS auto-detect."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import geo


def _forward_scalar(lon: float, lat: float, lon0: float):
    """Scalar mirror of utm_forward for property tests (same series)."""
    sphi = math.sin(math.radians(lat))
    lam = math.radians(lon) - math.radians(lon0)
    t = math.sinh(math.atanh(sphi) - geo._TM_C * math.atanh(geo._TM_C * sphi))
    xip = math.atan2(t, math.cos(lam))
    etap = math.atanh(math.sin(lam) / math.sqrt(1 + t * t))
    xi, eta = xip, etap
    for j, a in enumerate(geo._TM_ALPHA, start=1):
        xi += a * math.sin(2 * j * xip) * math.cosh(2 * j * etap)
        eta += a * math.cos(2 * j * xip) * math.sinh(2 * j * etap)
    return (
        geo._UTM_FALSE_E + geo._UTM_K0 * geo._TM_RADIUS * eta,
        geo._UTM_FALSE_N_SOUTH + geo._UTM_K0 * geo._TM_RADIUS * xi,
    )


def test_central_meridian_invariants():
    # on the central meridian: easting is exactly false easting, and
    # northing decreases from 1e7 by k0 * meridian arc (1 deg of
    # latitude ~ 110574.39 m on WGS84)
    e, n = _forward_scalar(27.0, -1.0, 27.0)
    assert e == pytest.approx(500000.0, abs=1e-6)
    assert n == pytest.approx(1e7 - 0.9996 * 110574.39, abs=5.0)
    # equator on the central meridian is exactly the false northing
    e0, n0 = _forward_scalar(27.0, 0.0, 27.0)
    assert n0 == pytest.approx(1e7, abs=1e-6)


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(min_value=24.5, max_value=31.5),
    lat=st.floats(min_value=-4.0, max_value=-0.1),
)
def test_roundtrip_identity(lon, lat):
    e, n = _forward_scalar(lon, lat, 27.0)
    lon2, lat2 = geo.utm_inverse_scalar(e, n, 27.0)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9  # < 0.1 mm


def test_spark_columns_match_scalar_mirror(spark):
    pts = [(28.6, -3.1), (29.7, -1.5), (30.9, -0.9)]
    df = spark.createDataFrame(pts, ["lon", "lat"])
    e, n = geo.utm_forward(F.col("lon"), F.col("lat"), 27.0)
    rows = df.select("lon", "lat", e.alias("E"), n.alias("N")).collect()
    for r in rows:
        es, ns = _forward_scalar(r.lon, r.lat, 27.0)
        assert r.E == pytest.approx(es, abs=1e-6)
        assert r.N == pytest.approx(ns, abs=1e-6)


def test_reproject_operator_roundtrip(spark):
    df = spark.createDataFrame([(29.5, -2.0)], ["lon", "lat"])
    utm = geo.reproject(df, "lon", "lat", src_epsg=4326, dst_epsg=32736)
    back = geo.reproject(
        utm.select(F.col("x_reproj").alias("e"), F.col("y_reproj").alias("n")),
        "e", "n", src_epsg=32736, dst_epsg=4326,
    ).collect()[0]
    assert back.x_reproj == pytest.approx(29.5, abs=1e-9)
    assert back.y_reproj == pytest.approx(-2.0, abs=1e-9)
    with pytest.raises(ValueError):
        geo.reproject(df, "lon", "lat", src_epsg=20935, dst_epsg=4326)


def test_detect_source_epsg_matches_reference_flow():
    # degree-looking sample inside Rwanda -> assumed 4326
    assert geo.detect_source_epsg(29.5, -2.0)[0] == 4326
    # a UTM-35S coordinate pair that inverse-projects into Rwanda
    e, n = _forward_scalar(29.5, -2.0, 27.0)
    assert geo.detect_source_epsg(e, n)[0] == 32735
    # a UTM-36S pair (its 35S inverse lands far east of Rwanda)
    e36, n36 = _forward_scalar(29.5, -2.0, 33.0)
    assert geo.detect_source_epsg(e36, n36)[0] in (32735, 32736)
    # nonsense coordinates -> undetectable
    assert geo.detect_source_epsg(1e9, 1e9)[0] is None


def test_molodensky_equator_prime_meridian_closed_form(spark):
    """At phi=0, lambda=0 the abridged Molodensky reduces to
    dphi = dZ/rho(0) and dlam = dY/nu(0) — hand-derivable from the
    ellipsoid constants, independent of the Column translation."""
    import math

    from pyspark.sql import functions as F

    from geoscale_healthflow_etl_django_analytics_spark.operators import geo

    p = geo.molodensky_params(geo.ARC1960_TO_WGS84)
    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    lat2, lon2 = geo.molodensky_shift(F.col("lat"), F.col("lon"), p)
    row = df.select(lat2.alias("la"), lon2.alias("lo")).collect()[0]
    rho0 = p["rho_num"]  # (1 - e2*0)^1.5 = 1
    nu0 = p["a"]
    exp_lat = math.degrees(p["dz"] / rho0)
    exp_lon = math.degrees(p["dy"] / nu0)
    assert abs(row["la"] - exp_lat) < 1e-12
    assert abs(row["lo"] - exp_lon) < 1e-12
