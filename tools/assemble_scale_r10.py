#!/usr/bin/env python
"""Assemble/merge BENCH_scale_r10.json from scale_bench payloads.

Usage: python tools/assemble_scale_r10.py payload.json [payload2.json ...]

Starts from BENCH_scale_r9.json's cells (carry), overlays every
(query, xN) cell found in the given scale_bench payload files, and
stamps attribution.  Fixes ADVICE r9 #3's two defects in the r9
merge tooling:

- a payload file must contain EXACTLY one JSON object (scale_bench
  prints one line; anything else — a truncated run, stray logging on
  stdout — aborts loudly instead of silently parsing the last line);
- re-measured cells are PRUNED from ``carried_from_r9`` as they merge,
  so no cell is ever attributed as both carried and newly measured.

Idempotent: re-merging the same payload overwrites the same cells.
The partition policy stamp is taken from the payloads (all round-10
runs share it; a mismatch aborts).
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(_REPO, "BENCH_scale_r9.json")
ART = os.path.join(_REPO, "BENCH_scale_r10.json")

CARRY_NOTE = (
    "cells not listed in new_cells_r10 are carried verbatim from "
    "BENCH_scale_r9.json; round-10 engine edits did not change any "
    "carried operator's plan (new single-purpose modules cms_exact/"
    "pq_index/splitting/lm_pretrained; subdoc joiner default "
    "unchanged; hll empty-input coalesce on a branch no corpus "
    "takes; png parser error typing). Re-measured cells (pq_lloyd, "
    "line_level, leakage_split) use the round-10 per-query partition "
    "policy stamped below."
)


def _load_payload(path: str) -> dict:
    with open(path) as fh:
        text = fh.read().strip()
    if not text:
        raise SystemExit(f"{path}: empty payload file")
    lines = [ln for ln in text.splitlines() if ln.strip()]
    objs = []
    for ln in lines:
        try:
            objs.append(json.loads(ln))
        except ValueError:
            raise SystemExit(
                f"{path}: non-JSON content on stdout "
                f"({ln[:80]!r}...) — rerun with stderr redirected"
            )
    if len(objs) != 1:
        raise SystemExit(
            f"{path}: expected exactly one JSON object, found {len(objs)}"
        )
    return objs[0]


def main(paths: list[str]) -> None:
    if os.path.exists(ART):
        art = json.load(open(ART))
    else:
        base = json.load(open(BASE))
        art = {
            "metric": "bench_scale_curve",
            "unit": "sec",
            "sf_base": "sf0.1",
            "method": "warmup+builder-inclusive+min-of-2",
            "scales": sorted(base.get("scales", [])),
            "queries": {n: dict(c) for n, c in base["queries"].items()},
            "new_cells_r10": {},
            "carried_from_r9": {
                n: sorted(c) for n, c in base["queries"].items()
            },
            "carry_note": CARRY_NOTE,
        }
    merged = []
    for p in paths:
        payload = _load_payload(p)
        pol = payload.get("partition_policy")
        if pol is not None:
            have = art.get("partition_policy")
            if have is None:
                art["partition_policy"] = pol
            else:
                # factor maps may GROW across runs (new queries gain a
                # class); a CHANGED factor for an existing query would
                # make cells non-comparable and aborts.
                if {k: v for k, v in pol.items() if k != "factors"} != {
                    k: v for k, v in have.items() if k != "factors"
                }:
                    raise SystemExit(f"{p}: partition rule differs across runs")
                for q, f in pol.get("factors", {}).items():
                    if q in have["factors"] and have["factors"][q] != f:
                        raise SystemExit(
                            f"{p}: factor for {q} changed across runs"
                        )
                    have["factors"][q] = f
        for q, cells in payload["queries"].items():
            for xk, cell in cells.items():
                art["queries"].setdefault(q, {})[xk] = cell
                new = art["new_cells_r10"].setdefault(q, [])
                if xk not in new:
                    new.append(xk)
                # ADVICE r9 #3: a re-measured cell is no longer carried
                carried = art.get("carried_from_r9", {})
                if q in carried and xk in carried[q]:
                    carried[q] = [c for c in carried[q] if c != xk]
                    if not carried[q]:
                        del carried[q]
                merged.append(f"{q}:{xk}")
        art["scales"] = sorted(
            set(art.get("scales", [])) | set(payload.get("scales", []))
        )
    with open(ART, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(f"wrote {ART}; merged {len(merged)} cells: {merged}")


if __name__ == "__main__":
    main(sys.argv[1:])
