#!/usr/bin/env python
"""Stage-split attribution for curation_pipeline's 2.67x-vs-r4
reading (VERDICT r10 "What's wrong" #3 / next-round #6).

Decomposes the chain at sf0.1 with the bench discipline (untimed
warmup + min-of-2, noop sink):

  A. scan + quality/char filter only
  B. A + fingerprint groupBy (keep-set derivation)
  C. the full registered chain (A + B + left-semi join)
  D. C with CollapseProject excluded — isolates how much of C is
     Catalyst re-inlining the quality_score expression into the
     filter and the post-join projection (the expression tree is
     regex-heavy, so collapse-driven re-evaluation is the prime
     suspect; the join's two sides also each evaluate the filter)
  E. the three quality_score terms scanned alone (token count /
     stopword ratio / non-alpha ratio) — per-term floor costs

Prints one JSON line; paste the table into PLANS.md with the
attribution verdict.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geoscale_healthflow_etl_django_analytics_spark import session  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.functions import text as T  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.sources import catalog  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(make_df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.perf_counter() - t0)
    return round(best, 3)


def main():
    spark = session.get_spark(app_name="probe-curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.load_table(spark, SF, "documents")
    t = F.col("text")

    def stage_a():
        q = T.quality_score(t, 6)
        cc = T.char_count(t)
        return docs.select(
            "doc_id", "lang", "source", "text", q.alias("q"), cc.alias("cc")
        ).filter((F.col("q") >= 0.5) & F.col("cc").between(50, 5000))

    def stage_b():
        return (
            stage_a()
            .groupBy(T.fingerprint(F.col("text")).alias("fp"))
            .agg(F.min("doc_id").alias("keep_doc_id"))
            .select("keep_doc_id")
        )

    full = lambda: REGISTRY["curation_pipeline"].builder(spark, SF)  # noqa: E731

    out = {}
    # warmup
    full().write.format("noop").mode("overwrite").save()
    out["A_filter_only"] = timed(stage_a)
    out["B_keep_set"] = timed(stage_b)
    out["C_full_chain"] = timed(full)
    rule = "org.apache.spark.sql.catalyst.optimizer.CollapseProject"
    spark.conf.set("spark.sql.optimizer.excludedRules", rule)
    out["D_full_no_collapse"] = timed(full)
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    for name, col in (
        ("E_token_count", T.token_count(t)),
        ("E_stopword_ratio", T.stopword_ratio(t, 6)),
        ("E_non_alpha_ratio", T.non_alpha_ratio(t, 6)),
        ("E_fingerprint", T.fingerprint(t)),
    ):
        out[name] = timed(
            lambda c=col: docs.select("doc_id", c.alias("v"))
        )
    print(json.dumps({"sf_dir": SF, "method": "warmup+min-of-2", **out}))
    spark.stop()


if __name__ == "__main__":
    main()
