#!/usr/bin/env python
"""Table-size-independence probe for the pretrained char-n-gram LM
apply (text_lm_apply_pretrained's claim): score the SAME corpus
against the 27^3 = 19,683-gram and 27^4 = 531,441-gram tables in one
session (same cache state, warmup + min-of-2 per tier) and print both
timings.  If the apply is a broadcast hash lookup as claimed, the 27x
table growth must not show in the corpus-pass cost.

Usage: SPARK_GRAFT_SCALES=200 python tools/probe_lm_tablesize.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from geoscale_healthflow_etl_django_analytics_spark.operators import lm_pretrained  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.session import get_spark  # noqa: E402
from geoscale_healthflow_etl_django_analytics_spark.sources.catalog import load_table  # noqa: E402


def main() -> None:
    m = int(os.environ.get("SPARK_GRAFT_SCALES", "200"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(app_name="lm-tablesize-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.path.join(_REPO, "_scale_data", f"x{m}")
    warm = load_table(spark, "/root/testdata/sf0.001", "documents")
    docs = load_table(spark, sf_dir, "documents")
    out = {}
    for n in (3, 4):
        lm_pretrained.chargram_lm_scores(warm, n=n).write.format(
            "noop"
        ).mode("overwrite").save()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            lm_pretrained.chargram_lm_scores(docs, n=n).write.format(
                "noop"
            ).mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            best = sec if best is None else min(best, sec)
        out[f"n{n}_grams_{27 ** n}"] = best
        print(f"# n={n} ({27 ** n} grams) x{m}: {best}s", file=sys.stderr)
    print(json.dumps({"metric": "lm_tablesize_probe", "x": m, "sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
