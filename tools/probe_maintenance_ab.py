#!/usr/bin/env python
"""Maintenance-vs-rebuild A/B for the two persisted artifacts
(VERDICT r10 next-round #3 done-condition: "an x200 A/B vs rebuild";
#4: "a cell showing add cost batch-proportional vs the 499s rebuild").

At x{SPARK_GRAFT_SCALES} (default 200) of sf0.1, measures wall-clock
for each lifecycle verb, one pass each (these are one-shot artifact
writes — min-of-2 would hide the build's one-time nature):

  cluster table : build(index 80%) | fold(batch 20%) | rebuild(100%)
  IVF-PQ index  : build(index 80%) | add(batch 20%)  | rebuild(100%)

The claim under test: fold/add is batch-proportional — it should cost
well under the 20%-of-rebuild a linear split would predict for the
encode-bound IVF-PQ (routing is an 8-row broadcast), and far under
rebuild for the cluster table (whose rebuild pays the corpus×corpus
LSH+CC; the fold pays batch-proportional pairs + a batch-graph CC).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from geoscale_healthflow_etl_django_analytics_spark.operators import (  # noqa: E402
    pq_index,
    splitting,
)
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import (  # noqa: E402
    load_table,
)


def main() -> None:
    m = int(os.environ.get("SPARK_GRAFT_SCALES", "200"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="maintenance-ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # the split family's stamped partition-policy class (factor 0.25)
    spark.conf.set("spark.sql.shuffle.partitions", str(max(32, m // 4)))
    sf_dir = os.path.join(_REPO, "_scale_data", f"x{m}")
    root = f"/tmp/maint_ab_x{m}_{os.getpid()}"
    os.makedirs(root, exist_ok=True)

    def clock(label, fn):
        t0 = time.perf_counter()
        fn()
        sec = round(time.perf_counter() - t0, 1)
        print(f"# {label}: {sec}s", file=sys.stderr)
        return sec

    docs = load_table(spark, sf_dir, "documents")
    idx_pred = lambda c: c % 10 < 8  # noqa: E731
    b_pred = lambda c: c % 10 >= 8  # noqa: E731
    out = {"x": m, "shuffle_partitions": max(32, m // 4)}
    out["cluster_build_index80"] = clock(
        "cluster build (80%)",
        lambda: splitting.write_cluster_table(
            docs.filter(idx_pred(F.col("doc_id"))), f"{root}/clu"
        ),
    )
    out["cluster_fold_batch20"] = clock(
        "cluster fold (20%)",
        lambda: splitting.fold_batch_into_cluster_table(
            docs, b_pred, f"{root}/clu"
        ),
    )
    out["cluster_rebuild_full"] = clock(
        "cluster rebuild (100%)",
        lambda: splitting.write_cluster_table(docs, f"{root}/clu2"),
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out["ivfpq_build_index80"] = clock(
        "ivfpq build (80%)",
        lambda: pq_index.write_ivfpq_index(
            emb.filter(F.col("vec_id") % 10 < 8), f"{root}/pq", iters=2
        ),
    )
    out["ivfpq_add_batch20"] = clock(
        "ivfpq add (20%)",
        lambda: pq_index.add_to_ivfpq_index(
            emb.filter(F.col("vec_id") % 10 >= 8), f"{root}/pq"
        ),
    )
    out["ivfpq_rebuild_full"] = clock(
        "ivfpq rebuild (100%)",
        lambda: pq_index.write_ivfpq_index(emb, f"{root}/pq2", iters=2),
    )
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "maintenance_vs_rebuild_ab", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
