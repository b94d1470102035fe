#!/usr/bin/env python
"""Compare two bench.py outputs per query.

Usage: python tools/compare_bench.py BEFORE_raw.txt AFTER_raw.txt

Each file is a bench.py stdout capture; the LAST JSON line (the
headline) carries the rounded per-query map, the line before it the
full-precision map — the full-precision one is used when present.
Prints per-query before/after/speedup sorted by absolute delta, the
total, geomean speedup over common queries, and the calibration
stamps so box drift is visible next to the ratios.
"""

from __future__ import annotations

import json
import math
import sys


def _load(path: str) -> tuple[dict, dict]:
    rows = []
    with open(path) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            try:
                rows.append(json.loads(ln))
            except ValueError:
                pass
    per = next(
        (r for r in rows if r.get("metric") == "bench_per_query"), None
    )
    head = next(
        (r for r in rows if r.get("metric") == "bench_headline_total"), None
    )
    if head is None:
        raise SystemExit(f"{path}: no headline line")
    queries = (per or head).get("queries", {})
    return queries, head


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    qa, ha = _load(sys.argv[1])
    qb, hb = _load(sys.argv[2])
    common = sorted(set(qa) & set(qb))
    rows = [(n, qa[n], qb[n], qa[n] / qb[n] if qb[n] else float("inf"))
            for n in common]
    rows.sort(key=lambda r: -(r[1] - r[2]))
    print(f"{'query':42s} {'before':>8s} {'after':>8s} {'speedup':>8s}")
    for n, a, b, s in rows:
        print(f"{n:42s} {a:8.3f} {b:8.3f} {s:8.2f}x")
    geo = math.exp(sum(math.log(s) for _, _, _, s in rows) / len(rows))
    ta, tb = sum(qa[n] for n in common), sum(qb[n] for n in common)
    print(f"\ncommon={len(rows)} total {ta:.1f} -> {tb:.1f} "
          f"({ta / tb:.3f}x), geomean {geo:.3f}x")
    print(f"before headline={ha.get('value')} cal={ha.get('calibration')}")
    print(f"after  headline={hb.get('value')} cal={hb.get('calibration')}")
    imp = sum(1 for r in rows if r[3] > 1.1)
    reg = sum(1 for r in rows if r[3] < 0.9)
    print(f"improved>10%: {imp}, regressed>10%: {reg}")


if __name__ == "__main__":
    main()
