#!/usr/bin/env python
"""Merge the round-9 second-wave scale cells into BENCH_scale_r9.json.

Reads one or more scale_bench JSON payloads (passed as file paths),
folds their (query, xN) cells into the round artifact's ``queries``
map, records every merged cell in ``new_cells_r9`` and refreshes the
carry note.  Idempotent: re-merging the same payload overwrites the
same cells.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(_REPO, "BENCH_scale_r9.json")


def main(paths: list[str]) -> None:
    art = json.load(open(ART))
    art.setdefault("queries", {})
    art.setdefault("new_cells_r9", {})
    merged = []
    for p in paths:
        with open(p) as fh:
            payload = json.loads(fh.read().strip().splitlines()[-1])
        for q, cells in payload["queries"].items():
            for xk, cell in cells.items():
                art["queries"].setdefault(q, {})[xk] = cell
                new = art["new_cells_r9"].setdefault(q, [])
                if xk not in new:
                    new.append(xk)
                merged.append(f"{q}:{xk}")
        scales = sorted(
            set(art.get("scales", [])) | set(payload.get("scales", []))
        )
        art["scales"] = scales
    with open(ART, "w") as fh:
        fh.write(json.dumps(art) + "\n")
    print(f"merged {len(merged)} cells: {merged}")


if __name__ == "__main__":
    main(sys.argv[1:])
