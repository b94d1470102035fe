"""Cluster-width census for the SemDeDup assign tiers at a scale point.

Usage: python tools/probe_census.py [x200] [probe|pruned|exact]
Prints top-5 cluster widths, total intra-cluster pair work, and the
assign wall time — the stage-attribution numbers VERDICT r7 asked for.
"""

from __future__ import annotations

import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import (  # noqa: E402
    ensure_parallelism,
)
from geoscale_healthflow_etl_django_analytics_spark.operators import similarity as sim  # noqa: E402


def main() -> None:
    point = sys.argv[1] if len(sys.argv) > 1 else "x200"
    tier = sys.argv[2] if len(sys.argv) > 2 else "probe"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="probe-census")
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(_REPO, "_scale_data", point, "embeddings.parquet")
    emb = ensure_parallelism(spark.read.parquet(path))
    n = emb.count()
    k = max(8, math.ceil(math.sqrt(n)))
    t0 = time.perf_counter()
    if tier == "probe":
        a = sim.lloyd_assignments_probe(emb, k, 2)
    elif tier == "pruned":
        a = sim.lloyd_assignments_pruned(emb, k, 2)
    else:
        a = sim.lloyd_assignments(emb, k, 2)
    a = a.localCheckpoint()
    assign_sec = time.perf_counter() - t0
    widths = a.groupBy("cid").count().orderBy(F.desc("count"))
    top = [r["count"] for r in widths.limit(5).collect()]
    pairs = widths.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).collect()[0]["p"]
    print(
        f"tier={tier} point={point} n={n} k={k} assign={assign_sec:.1f}s "
        f"top5={top} sum_pairs={pairs:.3e}"
    )


if __name__ == "__main__":
    main()
