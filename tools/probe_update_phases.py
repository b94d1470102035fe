#!/usr/bin/env python
"""Phase timing for the curation_cluster_table_update ledger-hit pass
(VERDICT r12 next-round #2/#3): which of the serialized driver actions
— ledger agg, batch band-hash checkpoint, candidate expansion
checkpoint, verified-pair checkpoint, CC fast-path collect, final
assignment sink — actually carries the per-pass seconds at sf0.1.

Runs the registered dataflow once untimed (builds the persisted
artifact + warms codegen), then N timed ledger-hit passes with a
perf_counter stamp around each phase.  Phases are the operator's own
localCheckpoint boundaries, so the split is exact, not sampled.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/probe_update_phases.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from geoscale_healthflow_etl_django_analytics_spark.operators import (  # noqa: E402
    splitting,
)
from geoscale_healthflow_etl_django_analytics_spark.operators.incremental import (  # noqa: E402
    incremental_minhash_pairs,
)
from geoscale_healthflow_etl_django_analytics_spark.operators.dedup import (  # noqa: E402
    minhash_perm_band_hashes,
)
from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.sources import catalog  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="probe-update-phases")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed: build artifacts + warm codegen (the registered builder)
    spec = REGISTRY["curation_cluster_table_update"]
    spec.builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    docs = catalog.load_table(spark, sf_dir, "documents")
    idx_pred = lambda c: c % 10 < 6  # noqa: E731
    b1_pred = lambda c: (c % 10 >= 6) & (c % 10 < 8)  # noqa: E731
    b2_pred = lambda c: c % 10 >= 8  # noqa: E731
    # the registered query's artifact path (already built above)
    from geoscale_healthflow_etl_django_analytics_spark.registry import (
        _roundtrip_path,
    )

    path = _roundtrip_path("cluster_fold", sf_dir)

    for i in range(n_passes):
        t = {}
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:ledger")
        splitting.ensure_folded_cluster_table(docs, idx_pred, b1_pred, path)
        t["ledger"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:read-clusters")
        iclu = spark.read.parquet(os.path.join(path, "clusters"))
        t["read_clusters"] = time.perf_counter() - t0

        # incremental_pairs_vs_index, split at its checkpoints
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:batch-bands")
        index_bands = spark.read.parquet(os.path.join(path, "bands")).select(
            "doc_id", "band", "bh", F.lit(False).alias("__new")
        )
        batch_bands = minhash_perm_band_hashes(
            docs.filter(b2_pred(F.col("doc_id")))
        ).localCheckpoint()
        t["batch_bands_ckpt"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:pairs")
        bb = batch_bands.select(
            "doc_id", "band", "bh", F.lit(True).alias("__new")
        )
        new_keys = bb.select("band", "bh").distinct()
        index_touched = index_bands.join(
            new_keys.hint("shuffle_hash"), ["band", "bh"], "left_semi"
        )
        tagged = index_touched.unionByName(bb)
        try:
            pairs = incremental_minhash_pairs(
                docs, threshold=0.8, tagged=tagged, prescreened=True
            )
        except TypeError:  # pre-r13 operator (stash A/B)
            pairs = incremental_minhash_pairs(
                docs, threshold=0.8, tagged=tagged.localCheckpoint()
            )
        t["candidates_plus_verify_build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:assign-build")
        out = splitting.incremental_leakage_safe_split(
            docs, iclu, pairs, b2_pred
        )
        t["assign_build_incl_pairs_ckpt_and_cc"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("phase:noop-sink")
        out.write.format("noop").mode("overwrite").save()
        t["noop_sink"] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        t = {k: round(v, 3) for k, v in t.items()}
        t["total"] = round(sum(t.values()), 3)
        print(json.dumps({"pass": i + 1, **t}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
