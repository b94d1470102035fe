#!/usr/bin/env python
"""Assemble/merge BENCH_scale_r11.json from scale_bench payloads —
now HASH-AWARE (VERDICT r10 "What's wrong" #1 / "Next round" #2).

Usage:
  python tools/assemble_scale_r11.py payload.json [payload2.json ...]
  python tools/assemble_scale_r11.py --check        # validate only

The r10 artifact carried ``text_cms_heavy_hitters`` x500 = 41.1 s
verbatim from r9 even though round 10 RETIRED the xxhash sketch that
cell was measured on — a carried cell described a different program.
This assembler makes that structurally impossible:

- every cell in the artifact stores the measured query's
  ``query_hash()`` AT MEASUREMENT TIME (scale_bench.py stamps a
  ``query_hashes`` map into each payload as of r11);
- cells carried from BENCH_scale_r10.json (which predates the stamp)
  are keyed at INIT with the round-start hash — valid because the
  round-11 tree is the tree the r10 judge verified those cells
  against, with the ONE known exception dropped explicitly below;
- on every merge AND on ``--check``, any cell whose stored hash no
  longer matches the live ``query_hash()`` is DROPPED and listed in
  ``dropped_stale_cells`` — an edited query's old cells can never
  survive into the artifact as if they described the new code.

The known-bad carry is refused at init: ``text_cms_heavy_hitters``
x500 (r9's xxhash implementation; the md5 tier that round 10 shipped
has fresh x1–x200 cells and gets fresh x500/x1000 cells this round).

Also carried over from the r10 assembler: exactly-one-JSON-object
payload parsing, carried-cell pruning on re-measure, partition-policy
factor-map growth with changed-factor abort, and idempotent merges.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

BASE = os.path.join(_REPO, "BENCH_scale_r10.json")
ART = os.path.join(_REPO, "BENCH_scale_r11.json")

# cells in the BASE artifact known to have been measured on a RETIRED
# implementation — refused at init, never carried.
STALE_AT_INIT = {("text_cms_heavy_hitters", "x500")}

CARRY_NOTE = (
    "cells not listed in new_cells_r11 are carried from "
    "BENCH_scale_r10.json and hash-keyed at round-11 start (the tree "
    "the r10 judge verified them against); the r9 xxhash-era "
    "text_cms_heavy_hitters x500 cell is dropped at init "
    "(dropped_stale_cells) rather than carried. Any round-11 edit to "
    "a measured query expires its carried cells at the next merge — "
    "see cell_hashes/dropped_stale_cells. NOTE data_layout: carried "
    "cells were measured under layout v1 (coalesce(1) single-file "
    "tables, a one-core scan floor for scan-dominated plans); cells "
    "in new_cells_r11 are measured under layout v2 and are the "
    "authoritative reading where both exist."
)


def _live_hashes() -> dict[str, str]:
    import __spark_entry__ as entry
    from geoscale_healthflow_etl_django_analytics_spark.registry import (
        REGISTRY,
    )

    return {n: entry.query_hash(s) for n, s in REGISTRY.items()}


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


def _init_artifact(live: dict[str, str]) -> dict:
    base = json.load(open(BASE))
    queries = {}
    cell_hashes: dict[str, dict[str, str]] = {}
    carried: dict[str, list[str]] = {}
    dropped: list[dict] = []
    for name, cells in base["queries"].items():
        kept = {}
        for xk, cell in cells.items():
            if (name, xk) in STALE_AT_INIT:
                dropped.append(
                    {
                        "query": name,
                        "cell": xk,
                        "sec": cell.get("sec"),
                        "reason": (
                            "measured on the retired r9 xxhash "
                            "implementation (VERDICT r10 #1)"
                        ),
                    }
                )
                continue
            kept[xk] = dict(cell)
        if not kept:
            continue
        queries[name] = kept
        carried[name] = sorted(kept)
        if name in live:
            cell_hashes[name] = {xk: live[name] for xk in kept}
    return {
        "metric": "bench_scale_curve",
        "unit": "sec",
        "sf_base": "sf0.1",
        "method": "warmup+builder-inclusive+min-of-2",
        "scales": sorted(base.get("scales", [])),
        "queries": queries,
        "new_cells_r11": {},
        "carried_from_r10": carried,
        "carry_note": CARRY_NOTE,
        "partition_policy": base.get("partition_policy"),
        "cell_hashes": cell_hashes,
        "dropped_stale_cells": dropped,
    }


def _drop_stale(art: dict, live: dict[str, str]) -> list[str]:
    """Drop every cell whose measurement-time hash no longer matches
    the live query_hash(). Returns the dropped cell keys."""
    dropped_keys = []
    for name in list(art["queries"]):
        if name not in live:
            continue  # harness-local curves (geo_j6_raster) keep their own key
        hmap = art["cell_hashes"].get(name, {})
        for xk in list(art["queries"][name]):
            stored = hmap.get(xk)
            if stored is not None and stored != live[name]:
                cell = art["queries"][name].pop(xk)
                hmap.pop(xk, None)
                art["dropped_stale_cells"].append(
                    {
                        "query": name,
                        "cell": xk,
                        "sec": cell.get("sec"),
                        "reason": "query_hash changed since measurement",
                    }
                )
                for ledger in ("carried_from_r10", "new_cells_r11"):
                    if xk in art.get(ledger, {}).get(name, []):
                        art[ledger][name] = [
                            c for c in art[ledger][name] if c != xk
                        ]
                        if not art[ledger][name]:
                            del art[ledger][name]
                dropped_keys.append(f"{name}:{xk}")
        if not art["queries"][name]:
            del art["queries"][name]
    return dropped_keys


def main(argv: list[str]) -> None:
    check_only = argv == ["--check"]
    paths = [] if check_only else argv
    live = _live_hashes()
    if os.path.exists(ART):
        art = json.load(open(ART))
    else:
        art = _init_artifact(live)
    merged = []
    for p in paths:
        payload = _load_payload(p)
        pol = payload.get("partition_policy")
        if pol is not None:
            have = art.get("partition_policy")
            if have is None:
                art["partition_policy"] = pol
            else:
                if {k: v for k, v in pol.items() if k != "factors"} != {
                    k: v for k, v in have.items() if k != "factors"
                }:
                    raise SystemExit(
                        f"{p}: partition rule differs across runs"
                    )
                for q, f in pol.get("factors", {}).items():
                    if q in have["factors"] and have["factors"][q] != f:
                        raise SystemExit(
                            f"{p}: factor for {q} changed across runs"
                        )
                    have["factors"][q] = f
        layout = payload.get("data_layout")
        if layout is not None:
            have_layout = art.get("data_layout")
            if have_layout is not None and have_layout != layout:
                raise SystemExit(f"{p}: data_layout differs across runs")
            art["data_layout"] = layout
        stamped = payload.get("query_hashes", {})
        for q, cells in payload["queries"].items():
            for xk, cell in cells.items():
                art["queries"].setdefault(q, {})[xk] = cell
                if q in stamped:
                    art["cell_hashes"].setdefault(q, {})[xk] = stamped[q]
                new = art["new_cells_r11"].setdefault(q, [])
                if xk not in new:
                    new.append(xk)
                carried = art.get("carried_from_r10", {})
                if q in carried and xk in carried[q]:
                    carried[q] = [c for c in carried[q] if c != xk]
                    if not carried[q]:
                        del carried[q]
                merged.append(f"{q}:{xk}")
        art["scales"] = sorted(
            set(art.get("scales", [])) | set(payload.get("scales", []))
        )
    dropped = _drop_stale(art, live)
    with open(ART, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(
        f"wrote {ART}; merged {len(merged)} cells: {merged}; "
        f"dropped stale: {dropped}"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
