#!/usr/bin/env python
"""Per-query profiling for the optimization round: times each
bench-tagged query via the noop sink (same methodology as bench.py)
and records Spark-side job/stage/task counts per query via the
status tracker, plus the formatted plan on request.

Usage:
  python tools/profile_bench.py                 # all bench queries
  python tools/profile_bench.py name1 name2     # a subset
  SPARK_GRAFT_PROFILE_PLANS=/path python ...    # also dump plans

Prints one JSON line per query:
  {"name":..., "warm_s":..., "t1":..., "t2":..., "min_s":...,
   "jobs":..., "stages":..., "tasks":...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_dir = os.environ.get("SPARK_GRAFT_PROFILE_PLANS")
    names = sys.argv[1:] or sorted(
        n for n, s in REGISTRY.items() if s.bench
    )
    spark = get_spark(app_name="healthflow-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    warm_sf = "/root/testdata/sf0.001"
    results = []
    for name in names:
        spec = REGISTRY[name]
        sc.setJobDescription(f"warm:{name}")
        tw = time.perf_counter()
        try:
            spec.builder(spark, warm_sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # pragma: no cover
            print(json.dumps({"name": name, "err": str(exc)[:200]}))
            continue
        warm_s = round(time.perf_counter() - tw, 3)

        times = []
        jobs0 = tracker.getJobIdsForGroup(None)
        stage_info = {}
        # time builder + action together, exactly like bench.py — for
        # many operators the heavy work (localCheckpoints, bounded
        # collects) runs during builder construction, not the sink.
        for i in range(2):
            sc.setJobDescription(f"{name}:pass{i + 1}")
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        if min(times) < 1.5:
            sc.setJobDescription(f"{name}:pass3")
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        jobs1 = tracker.getJobIdsForGroup(None)
        new_jobs = sorted(set(jobs1) - set(jobs0))
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        row = {
            "name": name,
            "warm_s": warm_s,
            "times": times,
            "min_s": min(times),
            "jobs": len(new_jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "passes": len(times),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            try:
                plan = spec.builder(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    spec.builder(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)

    total = round(sum(r["min_s"] for r in results), 3)
    print(json.dumps({"metric": "profile_total", "value": total,
                      "n": len(results)}))
    spark.stop()


if __name__ == "__main__":
    main()
