"""Box-calibration cell for bench artifacts (VERDICT r11 "What's
wrong" #2 / "Next round" #3).

The shared box's capacity has drifted across rounds — judge-run
baseline ratios went 1.1x (r8) -> 1.50x (r10) -> 1.83x (r11) on
byte-identical plans, with the pytest s/test proxy agreeing (1.39 ->
4.85 across four judge runs of a nearly-identical suite) — and
nothing in any BENCH_r*.json could separate box drift from code
regression.  This module stamps a FIXED-WORK calibration reading into
every bench artifact so cross-round ratios can be read normalized:

- ``cpu_s`` — a single-core CPU loop of pinned work (an md5 chain
  over fixed bytes: 600k updates of 1 KiB).  Proxies the pure-CPU
  profile (regex/md5-dense queries like curation_pipeline) that box
  degradation hits hardest.
- ``spark_s`` — a pinned 32-task Spark job over ``spark.range`` data
  (64M rows -> md5 -> 1000-key hash agg) with
  ``spark.sql.shuffle.partitions`` pinned to 32 for the cell.
  Proxies the scheduled/shuffled profile of the bench suite.

Both cells are min-of-2 after one untimed warmup, matching the
artifact's timing discipline.  The work is versioned: normalize only
against readings with the same ``version``.

This is HARNESS code: it lives at the repo root, outside the package,
so stamping or editing it can never expire a registered query's
credit or scale cells (``query_hash`` covers package modules only).
"""

from __future__ import annotations

import hashlib
import time

CAL_VERSION = 1
_CPU_ITERS = 600_000
_SPARK_ROWS = 64_000_000
_SPARK_TASKS = 64


def _cpu_pass() -> float:
    blk = b"\xa5" * 1024
    t0 = time.perf_counter()
    h = hashlib.md5()
    for _ in range(_CPU_ITERS):
        h.update(blk)
    _ = h.hexdigest()
    return time.perf_counter() - t0


def _spark_pass(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, _SPARK_ROWS, 1, _SPARK_TASKS)
        .select(
            (F.col("id") % 1000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.max("h").alias("hmax"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def calibration_cell(spark) -> dict:
    """Measure both cells (warmup + min-of-2 each) and return the
    artifact stamp.  The Spark cell pins shuffle partitions to 32 for
    its duration and restores the session's prior setting."""
    _cpu_pass()  # warmup (allocator/JIT-ish steady state)
    cpu_s = min(_cpu_pass() for _ in range(2))
    prior = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        _spark_pass(spark)  # warmup (codegen + noop sink classes)
        spark_s = min(_spark_pass(spark) for _ in range(2))
    finally:
        if prior is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
    return {
        "version": CAL_VERSION,
        "cpu_s": round(cpu_s, 3),
        "spark_s": round(spark_s, 3),
        "cpu_work": f"md5 x{_CPU_ITERS} of 1KiB, single core",
        "spark_work": (
            f"range({_SPARK_ROWS}, {_SPARK_TASKS} tasks) -> md5 -> "
            "1000-key hash agg, shuffle.partitions=32"
        ),
        "method": "warmup+min-of-2",
    }


if __name__ == "__main__":
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from geoscale_healthflow_etl_django_analytics_spark.session import get_spark

    spark = get_spark(app_name="bench-calibration")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(calibration_cell(spark)))
    spark.stop()
