"""C20/C21 ring hygiene: validity repairs, quantize, Douglas-Peucker —
edge cases beyond the registered closed-form queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.operators import geo


def _ring_df(spark, pts):
    df = spark.createDataFrame([(1,)], "id int")
    arr = F.array(
        *[
            F.struct(F.lit(float(x)).alias("lon"), F.lit(float(y)).alias("lat"))
            for x, y in pts
        ]
    )
    return df.select(arr.alias("ring"))


def _pts(row):
    return [(p["lon"], p["lat"]) for p in row]


def test_fix_ring_idempotent_on_valid(spark):
    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    out = _ring_df(spark, sq).select(geo.fix_ring(F.col("ring")).alias("r")).collect()
    assert _pts(out[0].r) == [(float(x), float(y)) for x, y in sq]


def test_fix_ring_closes_and_dedupes_runs(spark):
    bad = [(0, 0), (0, 0), (0, 0), (4, 0), (4, 4), (4, 4), (0, 4)]
    out = _ring_df(spark, bad).select(geo.fix_ring(F.col("ring")).alias("r")).collect()
    assert _pts(out[0].r) == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]


def test_ring_validity_flags_degenerate(spark):
    cases = {
        "zero_area": [(0, 0), (4, 0), (0, 0)],  # collapsed, closed, <4 pts
        "open": [(0, 0), (4, 0), (4, 4), (0, 4)],
        "valid": [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
    }
    for name, pts in cases.items():
        r = (
            _ring_df(spark, pts)
            .select(geo.ring_is_valid(F.col("ring")).alias("v"))
            .collect()[0]
            .v
        )
        assert r == (name == "valid"), name


def test_quantize_ring_collapses_staircase(spark):
    # half-unit staircase snaps to the unit grid and collapses runs
    stair = [(0.0, 0.0), (0.4, 0.1), (0.6, 0.4), (1.4, 0.6), (2.0, 1.0), (0.0, 0.0)]
    out = (
        _ring_df(spark, stair)
        .select(geo.quantize_ring(F.col("ring"), 1.0).alias("r"))
        .collect()
    )
    assert _pts(out[0].r) == [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (2.0, 1.0), (0.0, 0.0)]


def test_simplify_dp_keeps_real_bends(spark):
    # a genuine bend ABOVE tolerance must survive; collinear midpoints go
    pts = [(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 3.0), (4.0, 6.0), (0.0, 0.0)]
    df = _ring_df(spark, pts).select(F.lit(1).alias("poly_id"), "ring")
    out = geo.simplify_rings_dp(df, tolerance=0.1).collect()[0]
    assert out.n_before == 6 and out.n_after == 4
    assert _pts(out.ring) == [(0.0, 0.0), (4.0, 0.0), (4.0, 6.0), (0.0, 0.0)]

    # tolerance large enough swallows the bend too (endpoints survive)
    out2 = geo.simplify_rings_dp(df, tolerance=10.0).collect()[0]
    assert out2.n_after == 2


def test_fix_ring_idempotent_property(spark):
    """fix(fix(r)) == fix(r) and the output is always closed, for a
    batch of randomized defective rings (duplicates, unclosed, runs)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        n = rng.randint(3, 8)
        pts = [
            (float(rng.randint(-5, 5)), float(rng.randint(-5, 5)))
            for _ in range(n)
        ]
        # inject defects: duplicate a random vertex run; half stay open
        j = rng.randrange(len(pts))
        pts = pts[: j + 1] + [pts[j]] * rng.randint(0, 2) + pts[j + 1 :]
        if rng.random() < 0.5:
            pts.append(pts[0])
        rows.append((i, pts))
    df = spark.createDataFrame(
        [(i, [{"lon": x, "lat": y} for x, y in p]) for i, p in rows],
        "id int, ring array<struct<lon double, lat double>>",
    )
    out = df.select(
        "id",
        geo.fix_ring(F.col("ring")).alias("once"),
        geo.fix_ring(geo.fix_ring(F.col("ring"))).alias("twice"),
    ).collect()
    for r in out:
        assert _pts(r.once) == _pts(r.twice), r.id          # idempotent
        assert r.once[0] == r.once[-1], r.id                # closed
        for a, b in zip(r.once, r.once[1:-1]):
            assert a != b, r.id                             # no adjacent dups


def test_quantize_ring_on_grid_property(spark):
    """Every vertex of a quantized ring lies on the step grid and no
    two adjacent vertices are equal."""
    import random

    rng = random.Random(11)
    step = 2.5
    rows = [
        (
            i,
            [
                {"lon": rng.uniform(-20, 20), "lat": rng.uniform(-20, 20)}
                for _ in range(rng.randint(4, 10))
            ],
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "id int, ring array<struct<lon double, lat double>>"
    )
    out = df.select("id", geo.quantize_ring(F.col("ring"), step).alias("q")).collect()
    for r in out:
        for p in r.q:
            assert abs(p["lon"] / step - round(p["lon"] / step)) < 1e-9
            assert abs(p["lat"] / step - round(p["lat"] / step)) < 1e-9
        for a, b in zip(r.q, r.q[1:]):
            assert a != b


def test_merge_pixel_regions_shapes_and_singletons(spark):
    """Merged-region polygonize: an L-shaped region (merges across
    rows AND columns), a separate region of the same value (not
    adjacent -> distinct label), and a singleton with no same-value
    neighbor (labels itself via the coalesce path).

    Grid (values):      1 1 2
                        1 2 2
                        3 2 2
    """
    from geoscale_healthflow_etl_django_analytics_spark.operators.geo import (
        merge_pixel_regions,
    )

    rows = [
        (0, 0, 1.0), (1, 0, 1.0), (2, 0, 2.0),
        (0, 1, 1.0), (1, 1, 2.0), (2, 1, 2.0),
        (0, 2, 3.0), (1, 2, 2.0), (2, 2, 2.0),
    ]
    px = spark.createDataFrame(rows, "i int, j int, value double")
    got = {
        (r.i, r.j): r.region
        for r in merge_pixel_regions(px, stride=3).collect()
    }
    # node = i*3 + j
    assert got[(0, 0)] == got[(1, 0)] == got[(0, 1)] == 0  # L of 1s
    big2 = {got[(2, 0)], got[(1, 1)], got[(2, 1)], got[(1, 2)], got[(2, 2)]}
    assert big2 == {4}  # 2s all connected; min node = 1*3+1 = 4
    assert got[(0, 2)] == 2  # singleton 3 labels itself (0*3+2)
