"""Assemble BENCH_scale_r8.json: carry unchanged-operator cells from
BENCH_scale_r7.json, overlay the cells re-measured this round
(isolated scale_bench invocations), stamp the disclosure notes.

Run: python tools/assemble_scale_r8.py
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Cells measured this round (isolated scale_bench invocations, each
# warmup+builder-inclusive+min-of-2; transcribed from the invocation
# stdout). Updated as the round's runs complete.
NEW_CELLS: dict[str, dict[str, dict[str, float | int]]] = {
    "sim_semantic_dedup": {
        # refreshed REGISTERED x200 under the standard stamp — the r7
        # ledger's 636.4s figure was a disclosed cold single-pass
        # probe, never a registered cell
        "x200": {"sec": 289.161, "rows": 400000},
    },
    "sim_semantic_dedup_probe": {
        "x1": {"sec": 9.754, "rows": 2000},
        "x10": {"sec": 15.165, "rows": 20000},
        "x50": {"sec": 34.058, "rows": 100000},
        "x200": {"sec": 132.987, "rows": 400000},
        "x500": {"sec": 372.476, "rows": 1000000},
    },
    "curation_dsir_select": {
        # x200 refreshed at the sweep optimum (400 partitions); the
        # sweep row (200/400/800 -> 239.9/222.4/275.2) is in
        # dsir_sweep_note and PLANS.md
        "x200": {"sec": 222.389, "rows": 200},
    },
    "text_bpe_tokenize": {
        "x1": {"sec": 2.461, "rows": 5000},
        "x10": {"sec": 3.952, "rows": 50000},
        "x50": {"sec": 14.278, "rows": 250000},
        "x200": {"sec": 53.813, "rows": 1000000},
    },
    "curation_end_to_end": {
        "x1": {"sec": 9.388, "rows": 200},
        "x10": {"sec": 31.732, "rows": 200},
        "x50": {"sec": 97.062, "rows": 200},
    },
}

NOTES = {
    "carried_note": (
        "cells listed in carried_from_r7 are copied from "
        "BENCH_scale_r7.json: those operators' code paths did not "
        "change this round. similarity.py gained the NEW probe-tier "
        "functions (pure additions; the existing tiers' code is "
        "byte-identical), so sim_* carries are like-for-like."
    ),
    "semdedup_note": (
        "sim_semantic_dedup{,_pruned,_probe} cells are min across "
        "ISOLATED single-query scale_bench invocations (each itself "
        "warmup+builder-inclusive min-of-2) — combined multi-cell "
        "sessions inflate checkpoint-heavy queries (r7 measurement "
        "note). The exact tier's x200 cell is NEW this round under "
        "the standard stamp: 289.2s (the r7 PLANS 636.4s was a "
        "disclosed cold probe; min-of-2 with warmup reads 2.2x "
        "faster). Probe-tier x200 census: top cluster 1,095 vs the "
        "exact tier's 882 (pruned n_probe=2 sat at 6,228), total "
        "intra-cluster pairs 1.306e8 vs exact 1.29e8 (+1.2%), "
        "assign 62.6s."
    ),
    "dsir_sweep_note": (
        "curation_dsir_select x200 shuffle-partition sweep "
        "(VERDICT r7 #4): 200/400/800 partitions -> "
        "239.9/222.4/275.2s (each an isolated warmup+min-of-2 "
        "invocation). Partitions move it ~7% at the optimum and "
        "regress past it — the 1.25x/unit x200 term is NOT the "
        "minhash-style spill pattern; the curve is already "
        "SUB-linear x200->x500 (2.01x for 2.5x). The registered "
        "x200 cell is the 400-partition reading; x500 carries "
        "from r7 (481.8s at the default partition rule)."
    ),
}


def main() -> None:
    with open(os.path.join(_REPO, "BENCH_scale_r7.json")) as fh:
        r7 = json.load(fh)
    queries: dict = {}
    carried: list[str] = []
    for name, cells in r7["queries"].items():
        queries[name] = dict(cells)
        for cell in cells:
            carried.append(f"{name}:{cell}")
    for name, cells in NEW_CELLS.items():
        if not cells:
            continue
        tgt = queries.setdefault(name, {})
        for cell, v in cells.items():
            if f"{name}:{cell}" in carried:
                carried.remove(f"{name}:{cell}")
            tgt[cell] = v
    scales = sorted(
        {int(c[1:]) for cells in queries.values() for c in cells}
    )
    payload = {
        "metric": "bench_scale_curve",
        "unit": "sec",
        "sf_base": "sf0.1",
        "method": "warmup+builder-inclusive+min-of-2",
        "scales": scales,
        "carried_from_r7": sorted(carried),
        **{k: v for k, v in NOTES.items() if v},
        "session_order_note": r7.get("session_order_note", ""),
        "queries": queries,
    }
    out = os.path.join(_REPO, "BENCH_scale_r8.json")
    with open(out, "w") as fh:
        fh.write(json.dumps(payload) + "\n")
    print(f"wrote {out}: {len(queries)} queries, {len(carried)} carried")


if __name__ == "__main__":
    main()
