"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``geoscale_healthflow_etl_django_analytics_spark.registry`` — every
implemented operator from SURVEY.md §2 registers there with both a
Spark builder and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys
import types
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY, QuerySpec  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
_PKG = "geoscale_healthflow_etl_django_analytics_spark"
_HASH_SIDECAR = os.path.join(_REPO_DIR, ".query_check_hashes.json")

_module_digest_cache: dict[str, str] = {}


def _module_digest(mod: types.ModuleType) -> str:
    """md5 of a package module's file content (cached per module)."""
    name = getattr(mod, "__name__", "")
    if name not in _module_digest_cache:
        try:
            path = inspect.getsourcefile(mod) or ""
            with open(path, "rb") as fh:
                _module_digest_cache[name] = hashlib.md5(fh.read()).hexdigest()
        except (OSError, TypeError):
            _module_digest_cache[name] = "unreadable"
    return _module_digest_cache[name]


def query_hash(spec: QuerySpec) -> str:
    """Content hash of a registered query's implementation.

    Covers: the builder's own source (which includes the ``@register``
    decorator call and therefore usually the oracle SQL), the oracle SQL
    explicitly, and — at module-file granularity — every package module
    the builder references through its globals (e.g. a builder that
    calls ``ha.village_positivity`` hashes ``health_analytics.py``).
    Editing an operator module therefore expires the green credit of
    every query that uses it, which is the point: driver credit must not
    outlive the code it was earned on (VERDICT r3, "What's wrong" #1).

    ``registry.py`` itself is excluded from the module walk — adding an
    unrelated query to the registry must not invalidate all others; the
    builder's own ``getsource`` already captures registry-level edits.
    """
    parts = [spec.oracle or ""]
    try:
        parts.append(inspect.getsource(spec.builder))
    except (OSError, TypeError):
        parts.append(repr(spec.builder))
    fn = inspect.unwrap(spec.builder)
    code = getattr(fn, "__code__", None)
    globs = getattr(fn, "__globals__", {})
    mods: dict[str, types.ModuleType] = {}
    for name in getattr(code, "co_names", ()):
        obj = globs.get(name)
        if obj is None:
            continue
        if isinstance(obj, types.ModuleType):
            mod = obj
        else:
            mod = sys.modules.get(getattr(obj, "__module__", ""), None)
        if mod is None:
            continue
        mname = getattr(mod, "__name__", "")
        if mname.startswith(_PKG) and not mname.endswith(".registry"):
            mods[mname] = mod
    for mname in sorted(mods):
        parts.append(f"{mname}:{_module_digest(mods[mname])}")
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


def _artifact_green() -> set[str]:
    """Query names with a satisfactory row in ANY past driver artifact.

    "Satisfactory" means: a green oracle row (``err is None`` and
    ``hash_match``), or — for queries registered without an oracle by
    design — a recorded row count (``err == 'no_oracle'``), which is the
    strongest check those can ever receive.
    """
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") is None and row.get("hash_match"):
                seen.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                seen.add(name)
    return seen


def _load_sidecar() -> dict[str, str]:
    try:
        with open(_HASH_SIDECAR) as fh:
            data = json.load(fh)
        return {k: v for k, v in data.items() if isinstance(v, str)}
    except (OSError, ValueError):
        return {}


def sync_check_hashes() -> dict[str, str]:
    """Record, per green query, the implementation hash the credit was earned on.

    Run at ROUND START (``python __spark_entry__.py sync``), before any
    code edits: at that moment the working tree is byte-identical to
    what the driver just tested, so ``query_hash()`` equals the hash at
    check time for every query green in the newest artifact.  Names green
    only in older artifacts keep their existing sidecar entry (recorded
    at an earlier round start); absent entries are bootstrapped to the
    current hash (one-time adoption assumption, validated by the local
    parity mirror which runs all queries against the current code).

    Never run this mid-round after editing code — queries() treats a
    stale-vs-current hash mismatch as "unchecked", and forgetting to
    sync only over-checks (safe direction), while syncing after edits
    would under-check.
    """
    green = _artifact_green()
    sidecar = _load_sidecar()
    newest: set[str] = set()
    paths = sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")))
    if paths:
        try:
            with open(paths[-1]) as fh:
                newest = set(json.load(fh))
        except (OSError, ValueError):
            newest = set()
    out: dict[str, str] = {}
    for name in sorted(green):
        if name not in REGISTRY:
            continue
        if name in newest or name not in sidecar:
            out[name] = query_hash(REGISTRY[name])
        else:
            out[name] = sidecar[name]
    with open(_HASH_SIDECAR, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return out


def _driver_checked() -> set[str]:
    """Names whose green driver credit is still valid for the CURRENT code.

    The driver snapshots only the first 50 entries of ``queries()`` into
    ``CORRECTNESS_r{N}.json``; never-checked queries are ordered first so
    every query eventually gets a driver row.  A query counts as checked
    only if (a) some past artifact has a satisfactory row for it AND
    (b) its implementation hash still matches the sidecar recorded when
    that credit was earned — so editing a builder, its oracle, or any
    operator module it uses expires the credit and rotates the query
    back into the driver's snapshot window automatically.
    """
    green = _artifact_green()
    sidecar = _load_sidecar()
    return {
        name
        for name in green
        if name in REGISTRY and sidecar.get(name) == query_hash(REGISTRY[name])
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A4 daily positivity — scan → semantic map →
    groupBy → rates) on sf0.001; driver checks rows>0."""
    return REGISTRY["hc_a4_daily_positivity"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """All registered queries, never-driver-checked ones first.

    Within each group (unchecked, then checked) the registry's insertion
    order is preserved, so the listing stays stable and readable while
    unchecked queries rotate into the driver's 50-entry snapshot window.
    """
    checked = _driver_checked()
    ordered = sorted(REGISTRY, key=lambda n: (n in checked,))
    return {name: REGISTRY[name].builder for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sync":
        synced = sync_check_hashes()
        print(f"synced {len(synced)} check hashes -> {_HASH_SIDECAR}")
    else:
        checked = _driver_checked()
        order = list(queries())
        print(f"{len(order)} queries; {len(checked)} checked; first 50 window:")
        for name in order[:50]:
            print(("  " if name in checked else "* ") + name)
