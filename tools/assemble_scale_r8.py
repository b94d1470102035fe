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
        # filled by the round's runs
    },
    "curation_dsir_select": {},
    "text_bpe_tokenize": {},
    "curation_end_to_end": {},
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
    "dsir_sweep_note": "",  # filled after the sweep
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
