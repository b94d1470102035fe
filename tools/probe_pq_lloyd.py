#!/usr/bin/env python
"""Stage split for sim_pq_lloyd's x200 cell (VERDICT r8 next-round
#4): 400.1s at x200, 4.8x for 4x data x50→x200 — attribute the
super-linear term before it hides something real.

The operator (operators/pq.py::pq_lloyd_codebooks, iters=2) has four
candidate stages per the plan:
  A. subvector explode (pq_subvectors: corpus pass, 4 rows/vector)
  B. per-round assign (_assign_subvectors: broadcast codebook join +
     min(struct) groupBy over (vec_id, s))
  C. per-round exact-decimal means groupBy over (s, cid, pos) —
     the suspect: DECIMAL(30,8) sums over subd positions per
     assignment row, i.e. a 16x posexplode of the assign output
  D. final summary agg (count + mean_l2 per (s, cid))

This probe times each round's assign and means stages separately by
forcing execution with a noop write at each boundary, at the scale
points given by SPARK_GRAFT_SCALES (default 50,200), plus a shuffle-
partition sweep at the largest point (the DSIR-sweep precedent).
Output: one JSON line per (scale, stage).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geoscale_healthflow_etl_django_analytics_spark import scalegen  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.functions.exact import (  # noqa: E402
    DECIMAL_TYPE,
    fround,
)
from geoscale_healthflow_etl_django_analytics_spark.operators import pq  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _summary(final):
    return final.groupBy("s", F.col("code").alias("cid")).agg(
        F.count("*").alias("n_assigned"),
        fround(
            F.sum(F.col("d").cast(DECIMAL_TYPE)).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_l2"),
    )


def real_run(spark, sf_dir: str, label: str) -> dict:
    """The operator's EXACT lineage (sub re-derived per round, only
    the m*ks-row codebook checkpointed) with a timer at each round
    boundary — per-round cost is assign+means fused in one job."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import catalog

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    out: dict[str, float] = {}
    sub = pq.pq_subvectors(emb)
    cur = pq.pq_codebooks(emb)
    for i in range(2):
        a = pq._assign_subvectors(sub, cur)
        comp = a.select(
            "s", F.col("code").alias("cid"),
            F.posexplode("sv").alias("pos", "x"),
        )
        means = comp.groupBy("s", "cid", "pos").agg(
            fround(
                F.sum(F.col("x").cast(DECIMAL_TYPE)).cast("double")
                / F.count("*"),
                8,
            ).alias("mv")
        )
        t0 = time.perf_counter()
        cur = (
            means.groupBy("s", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mv"))),
                    lambda t: t["mv"],
                ).alias("cv")
            )
            .localCheckpoint()
        )
        out[f"round{i}_assign_means"] = round(time.perf_counter() - t0, 3)
    out["final_assign_summary"] = _noop(
        _summary(pq._assign_subvectors(sub, cur, with_sv=False))
    )
    out["total"] = round(sum(out.values()), 3)
    print(json.dumps({"probe": "pq_lloyd_real", "label": label, **out}))
    return out


def split_run(spark, sf_dir: str, label: str) -> dict:
    """Decomposed lineage (DISCLOSED modification): sub checkpointed
    once, assign checkpointed per round — splits each round into its
    assign pass vs its means groupBy, and isolates the repeated
    subvector derivation the real shape pays 3x."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import catalog

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    sub = pq.pq_subvectors(emb).localCheckpoint()
    out["A_subvectors_checkpoint"] = round(time.perf_counter() - t0, 3)

    cur = pq.pq_codebooks(emb)
    for i in range(2):
        t0 = time.perf_counter()
        a = pq._assign_subvectors(sub, cur).localCheckpoint()
        out[f"B{i}_assign_checkpoint"] = round(time.perf_counter() - t0, 3)
        comp = a.select(
            "s", F.col("code").alias("cid"),
            F.posexplode("sv").alias("pos", "x"),
        )
        means = comp.groupBy("s", "cid", "pos").agg(
            fround(
                F.sum(F.col("x").cast(DECIMAL_TYPE)).cast("double")
                / F.count("*"),
                8,
            ).alias("mv")
        )
        t0 = time.perf_counter()
        cur = (
            means.groupBy("s", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mv"))),
                    lambda t: t["mv"],
                ).alias("cv")
            )
            .localCheckpoint()
        )
        out[f"C{i}_means_checkpoint"] = round(time.perf_counter() - t0, 3)

    out["D_final_summary"] = _noop(
        _summary(pq._assign_subvectors(sub, cur, with_sv=False))
    )
    out["total"] = round(sum(out.values()), 3)
    print(json.dumps({"probe": "pq_lloyd_split", "label": label, **out}))
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="pq-lloyd-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_SCALES", "50,200").split(",")
    ]
    # untimed warmup at the gate SF
    split_run(spark, "/root/testdata/sf0.001", "warmup")
    real_run(spark, "/root/testdata/sf0.001", "warmup")
    for m in scales:
        sf_dir = os.path.join(_REPO, "_scale_data", f"x{m}")
        if not os.path.exists(
            os.path.join(sf_dir, "embeddings.parquet", "_SUCCESS")
        ):
            scalegen.write_scale_dir(
                spark, sf_dir, m, skip_existing=True, only=("embeddings",)
            )
        spark.conf.set("spark.sql.shuffle.partitions", str(max(32, m)))
        real_run(spark, sf_dir, f"x{m}")
        split_run(spark, sf_dir, f"x{m}")
        # partition sweep at the largest point
        if m == scales[-1]:
            for p in (
                os.environ.get("SPARK_GRAFT_SWEEP", "64,400").split(",")
            ):
                spark.conf.set("spark.sql.shuffle.partitions", p.strip())
                real_run(spark, sf_dir, f"x{m}_p{p.strip()}")
    spark.stop()


if __name__ == "__main__":
    main()
