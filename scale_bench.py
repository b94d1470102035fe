#!/usr/bin/env python
"""Scale-curve benchmark for the heavy operators (VERDICT r4 #1).

Measures the six scale-critical operator families at multiple corpus
sizes so growth is OBSERVED, not argued from plan shape:

- ``dedup_minhash_lsh`` / ``dedup_simhash_pairs`` /
  ``dedup_connected_components`` — documents at Nx sf0.1
- ``sim_knn_join`` — embeddings at Nx sf0.1
- ``asof_attribution_chunked`` — events at Nx sf0.1
- ``geo_j6_raster`` — the binned zonal join at Nx the 600k-pixel
  raster (pixels scale; the 250-polygon dimension stays fixed, like a
  zone layer would at 100 TB)

Scale points default to 1x / 10x / 50x of sf0.1 (override:
``SPARK_GRAFT_SCALES=1,10,50``). The 1x point reads the driver's
sf0.1 corpus; larger points are generated deterministically on first
use by ``scalegen.write_scale_dir`` under ``_scale_data/`` (gitignored
— ~50x is ~120 MB; regeneration is cheap and exact).

Every scale point (x1 INCLUDED) reads the synthetic generator's
corpus, so curve ratios compare corpora with identical statistics —
the driver's sf0.1 documents have a denser near-dup structure, so x1
numbers here are NOT comparable to bench.py's sf0.1 numbers.

Timing: every query is first run once at the smallest scale (untimed
JVM/codegen warmup); per scale point the row count runs FIRST
(untimed — it would otherwise re-execute the query after the timed
pass and double the charged wall-clock) and then ONE timed pass via
the noop sink — min-of-2 would double multi-minute runs for a curve
whose signal is the RATIO between scale points, not the absolute
second. Output: one JSON line, also written to BENCH_scale_r{N}.json
when ``SPARK_GRAFT_ROUND`` is set.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoscale_healthflow_etl_django_analytics_spark import scalegen  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.abspath(__file__))
SF01 = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

REGISTRY_QUERIES = (
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_simhash_wide_pairs",
    "dedup_connected_components",
    "sim_knn_join",
    "asof_attribution_chunked",
)


def _geo_raster(spark, multiplier: int):
    """The geo_j6_raster_bench dataflow with the pixel grid scaled by
    ``multiplier`` (same operators, same 250-polygon zone layer)."""
    from pyspark.sql import functions as F

    from geoscale_healthflow_etl_django_analytics_spark.functions.exact import fround
    from geoscale_healthflow_etl_django_analytics_spark.operators import geo
    from geoscale_healthflow_etl_django_analytics_spark.sources import catalog

    side = math.sqrt(multiplier)
    nation = catalog.load_table(spark, SF01, "nation")
    joined = geo.binned_zonal_join(
        geo.synth_polygons_many(nation, per_nation=10),
        geo.pixel_grid_par(
            spark, nx=int(round(1000 * side)), ny=int(round(600 * side))
        ),
        cell=32.0,
    )
    return joined.groupBy("poly_id", "name").agg(
        fround(
            F.sum("pixel_value_n").cast("double") / 3.0 / F.count("*"), 4
        ).alias("mean_value"),
        (F.max("pixel_value_n") / 3.0).alias("max_value"),
        (F.min("pixel_value_n") / 3.0).alias("min_value"),
        F.count("*").alias("pixel_count"),
    )


def _scale_dir(spark, multiplier: int) -> str:
    # Every scale point (x1 included) uses the synthetic generator, so
    # curve ratios compare corpora with IDENTICAL statistics — the
    # driver's sf0.1 documents have a much denser near-dup structure
    # than the generator, which would skew x1 vs x10 comparisons.
    out = os.path.join(_REPO, "_scale_data", f"x{multiplier}")
    if not os.path.exists(os.path.join(out, "events.parquet", "_SUCCESS")):
        t0 = time.perf_counter()
        scalegen.write_scale_dir(spark, out, multiplier)
        print(
            f"# generated {out} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    return out


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "1,10,50").split(",")
    ]
    # 50x corpora need real heap in a single local JVM
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="healthflow-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: codegen/broadcast/JIT
    for name in REGISTRY_QUERIES:
        try:
            REGISTRY[name].builder(spark, WARM).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    _geo_raster(spark, 1).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, dict[str, float]]] = {}
    for m in scales:
        sf_dir = _scale_dir(spark, m)
        for name in REGISTRY_QUERIES:
            df = REGISTRY[name].builder(spark, sf_dir)
            rows = df.count()
            sec = _run(df)
            out.setdefault(name, {})[f"x{m}"] = {"sec": sec, "rows": rows}
            print(f"# {name} x{m}: {sec}s, {rows} rows", file=sys.stderr)
        df = _geo_raster(spark, m)
        rows = df.count()
        sec = _run(df)
        out.setdefault("geo_j6_raster", {})[f"x{m}"] = {
            "sec": sec,
            "rows": rows,
        }
        print(f"# geo_j6_raster x{m}: {sec}s, {rows} rows", file=sys.stderr)

    payload = {
        "metric": "bench_scale_curve",
        "unit": "sec",
        "sf_base": "sf0.1",
        "method": "warmup+single-pass-noop",
        "scales": scales,
        "queries": out,
    }
    line = json.dumps(payload)
    print(line)
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd:
        with open(os.path.join(_REPO, f"BENCH_scale_r{rnd}.json"), "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
