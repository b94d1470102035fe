"""Carry driver-check credit across in-round edits — STRICTLY.

Problem (VERDICT r5 "What's missing" #3): the credit sidecar is synced
at round start, then every substantive in-round edit to a shared module
correctly expires the credit of all queries whose code path includes
it.  The designed recovery is driver rotation (50 queries per round),
so observed "checked" counts stay far below the target.

This tool recovers ONLY the credit that provably never expired: it
materializes the round-start tree (the exact pkg state the driver
artifact was produced against, and the state the sidecar sync blessed)
in a throw-away git worktree, computes the CURRENT __spark_entry__
``query_hash`` for every query in BOTH trees, and re-keys the sidecar
entry only where the two hashes are equal — i.e. the query's builder,
oracle, registry helpers, and the transitive closure of package
modules it touches are all byte-identical to what the driver tested.
Queries whose path changed keep their stale entry and remain expired,
exactly as the expiry design intends.

This is STRICTER than the sidecar's built-in version-rekey (which
re-keys everything at a clean-tree sync and is only valid at round
start): nothing is blessed that the driver did not test.

Usage:  python tools/carry_credit.py <round-start-commit>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBPROG = r"""
import importlib.util, json, sys
spec = importlib.util.spec_from_file_location("entry_mod", sys.argv[1])
mod = importlib.util.module_from_spec(spec)
sys.path.insert(0, sys.argv[2])
spec.loader.exec_module(mod)
out = {}
for name, qs in mod.REGISTRY.items():
    try:
        out[name] = mod.query_hash(qs)
    except Exception as e:  # a query absent/broken in that tree: no carry
        out[name] = f"__error__:{type(e).__name__}"
print(json.dumps(out))
"""


def _hashes(entry_path: str, repo_dir: str) -> dict[str, str]:
    """All query hashes computed by ``entry_path``'s code against the
    package tree rooted at ``repo_dir`` (run in a subprocess so the two
    trees' imports can't bleed into each other)."""
    res = subprocess.run(
        [sys.executable, "-c", _SUBPROG, entry_path, repo_dir],
        capture_output=True,
        text=True,
        timeout=600,
    )
    if res.returncode != 0:
        raise RuntimeError(f"hash subprocess failed:\n{res.stderr[-2000:]}")
    return json.loads(res.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    base = sys.argv[1]
    entry_now = os.path.join(_REPO, "__spark_entry__.py")
    sidecar_path = os.path.join(_REPO, ".query_check_hashes.json")
    with open(sidecar_path) as fh:
        sidecar = json.load(fh)

    with tempfile.TemporaryDirectory(prefix="carry_credit_") as tmp:
        wt = os.path.join(tmp, "base")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, base],
            cwd=_REPO, check=True, capture_output=True,
        )
        try:
            # CURRENT hash function over the ROUND-START tree: copy
            # today's __spark_entry__ beside the old package so its
            # sys.path insertion resolves the old modules.
            entry_base = os.path.join(wt, "__entry_now__.py")
            with open(entry_now) as src, open(entry_base, "w") as dst:
                dst.write(src.read())
            old = _hashes(entry_base, wt)
            # the BASE COMMIT'S OWN hash function over its own tree —
            # the function/version the sidecar entries were recorded
            # under (ADVICE r6 #1): an entry is proven un-expired at
            # round start only if it equals THIS hash; without the
            # check, a query whose credit expired in a PREVIOUS round
            # but whose code is unchanged this round would get its
            # entry rewritten to the current hash, resurrecting credit
            # the driver never re-earned.
            old_ownfn = _hashes(os.path.join(wt, "__spark_entry__.py"), wt)
            new = _hashes(entry_now, _REPO)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=_REPO, capture_output=True,
            )

    version = sidecar.get("__hash_version__")
    carried, expired, stale_at_base = [], [], []
    for name, h_new in sorted(new.items()):
        if name not in sidecar:
            continue  # never had credit; driver rotation will cover it
        if sidecar[name] != old_ownfn.get(name):
            # the entry did NOT match the base tree under the base
            # commit's own hash function — its credit had already
            # expired BEFORE this round started (or was recorded under
            # an older hash version). Unchanged-this-round is not
            # enough: the driver never re-tested it (ADVICE r6 #1).
            stale_at_base.append(name)
            continue
        if old.get(name) == h_new and not h_new.startswith("__error__"):
            if sidecar[name] != h_new:
                sidecar[name] = h_new
                carried.append(name)
        else:
            expired.append(name)
    # re-keyed entries are CURRENT-hash-function hashes, so stamp the
    # current version (stale entries simply won't match — harmless)
    from __spark_entry__ import _HASH_VERSION  # noqa: E402

    sidecar["__hash_version__"] = _HASH_VERSION
    with open(sidecar_path, "w") as fh:
        json.dump(sidecar, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"base={base} version {version}->{_HASH_VERSION}: "
        f"carried {len(carried)}, changed-path (stay expired) "
        f"{len(expired)}, already-stale-at-base (not resurrected) "
        f"{len(stale_at_base)}"
    )
    for name in expired:
        print(f"  expired: {name}")


if __name__ == "__main__":
    sys.path.insert(0, _REPO)
    main()
