"""Change-aware driver rotation (__spark_entry__.py).

VERDICT r3 "What's wrong" #1: green driver credit must expire when the
code it was earned on changes.  These tests pin the mechanism without
touching the real sidecar.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_query_hash_depends_on_oracle(entry_mod):
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY, QuerySpec

    spec = REGISTRY["hc_a2_gender_positivity"]
    h0 = entry_mod.query_hash(spec)
    assert h0 == entry_mod.query_hash(spec), "hash must be deterministic"
    mutated = QuerySpec(
        name=spec.name,
        builder=spec.builder,
        oracle=(spec.oracle or "") + " -- changed",
        tags=spec.tags,
        bench=spec.bench,
        doc=spec.doc,
    )
    assert entry_mod.query_hash(mutated) != h0


def test_query_hash_covers_operator_modules(entry_mod):
    """A builder that delegates to an operator module must hash that
    module's file, so editing the operator expires the query's credit."""
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    spec = REGISTRY["dedup_connected_components"]
    fn = spec.builder
    sources = {
        m
        for m in sys.modules
        if m.startswith("geoscale_healthflow_etl_django_analytics_spark.operators")
    }
    assert sources, "operator modules should be imported"
    # The hash walk resolves the builder's globals; the dedup builder
    # references the dedup operator module, whose digest feeds the hash.
    before = entry_mod.query_hash(spec)
    entry_mod._module_digest_cache.clear()
    key = "geoscale_healthflow_etl_django_analytics_spark.operators.dedup"
    entry_mod._module_digest_cache[key] = "tampered"
    try:
        after = entry_mod.query_hash(spec)
    finally:
        entry_mod._module_digest_cache.clear()
    assert after != before, (
        "faking a dedup.py content change must change the query hash "
        f"(builder globals walk missed module {key})"
    )
    assert fn is spec.builder


def test_stale_hash_rotates_query_to_front(entry_mod, tmp_path, monkeypatch):
    """A green query whose sidecar hash mismatches the current hash is
    treated as unchecked and ordered into the driver's 50-entry window."""
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    victim = "hc_a5_total_summary"
    sidecar = {
        name: entry_mod.query_hash(spec) for name, spec in REGISTRY.items()
    }
    sidecar[victim] = "0" * 32  # simulate an edit since the credit was earned
    path = tmp_path / "hashes.json"
    path.write_text(json.dumps(sidecar))
    monkeypatch.setattr(entry_mod, "_HASH_SIDECAR", str(path))

    checked = entry_mod._driver_checked()
    assert victim not in checked
    order = list(entry_mod.queries())
    assert order.index(victim) < 50
    # every other green query keeps its credit
    assert "hc_a2_gender_positivity" in checked

@pytest.mark.parametrize(
    ("query", "module"),
    [
        # ADVICE r4 #1: these builders import their operator modules
        # INSIDE the function body; the old globals-only walk missed
        # them, so editing the module never expired driver credit.
        ("ts_resample_interpolate", "operators.timeseries"),
        ("mm_bmp_decode_stats", "operators.multimodal"),
        ("mm_bmp_decode_stats", "sources.bmp"),
        ("mm_wav_decode_stats", "sources.wav"),
        ("sample_weighted_exp_key", "functions.hashing"),
        # transitive: the builder reaches geo.merge_pixel_regions, which
        # itself uses operators.dedup for the connected-component pass
        ("s4_polygonize_regions", "operators.dedup"),
    ],
)
def test_query_hash_covers_local_and_transitive_imports(entry_mod, query, module):
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    spec = REGISTRY[query]
    full = f"geoscale_healthflow_etl_django_analytics_spark.{module}"
    assert full in entry_mod.query_dep_modules(spec), (
        f"{query} must hash {module} (function-local/transitive import)"
    )
    before = entry_mod.query_hash(spec)
    entry_mod._module_digest_cache.clear()
    entry_mod._module_digest_cache[full] = "tampered"
    try:
        after = entry_mod.query_hash(spec)
    finally:
        entry_mod._module_digest_cache.clear()
    assert after != before, f"editing {module} must change {query}'s hash"


def test_dep_closure_excludes_registry_and_stays_bounded(entry_mod):
    """registry.py must never enter the walk (its function-local imports
    span the whole package and would fan every hash out to every module)."""
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    for spec in REGISTRY.values():
        deps = entry_mod.query_dep_modules(spec)
        assert not any(d.endswith(".registry") for d in deps)
        assert len(deps) <= 15, (
            f"{spec.name}: dep closure unexpectedly broad ({len(deps)}) — "
            "a registry-wide fan-out would make rotation churn on every edit"
        )


def test_sync_refuses_on_dirty_package_tree(entry_mod, tmp_path, monkeypatch):
    """VERDICT r4 'Next round' #3: the round-start-only invariant is
    mechanical — sync must refuse when package files are modified."""
    monkeypatch.setattr(entry_mod, "_HASH_SIDECAR", str(tmp_path / "h.json"))
    monkeypatch.setattr(
        entry_mod, "_pkg_tree_dirty", lambda: [" M geoscale_healthflow_etl_django_analytics_spark/registry.py"]
    )
    with pytest.raises(RuntimeError, match="refusing to sync"):
        entry_mod.sync_check_hashes()
    # force=True overrides (documented escape hatch)
    out = entry_mod.sync_check_hashes(force=True)
    assert isinstance(out, dict)
    # clean tree proceeds normally and stamps the hash version
    monkeypatch.setattr(entry_mod, "_pkg_tree_dirty", lambda: [])
    out = entry_mod.sync_check_hashes()
    payload = json.loads((tmp_path / "h.json").read_text())
    assert payload["__hash_version__"] == entry_mod._HASH_VERSION


def test_sync_rekeys_on_hash_version_bump(entry_mod, tmp_path, monkeypatch):
    """A sidecar written by an older query_hash() version is re-keyed in
    full at the next clean-tree sync, so widened hash coverage cannot
    strand stale credit."""
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    green = entry_mod._artifact_green() & set(REGISTRY)
    assert green, "artifacts should contain green queries"
    victim = sorted(green)[0]
    stale = {name: "0" * 32 for name in green}
    stale["__hash_version__"] = entry_mod._HASH_VERSION - 1
    path = tmp_path / "h.json"
    path.write_text(json.dumps(stale))
    monkeypatch.setattr(entry_mod, "_HASH_SIDECAR", str(path))
    monkeypatch.setattr(entry_mod, "_pkg_tree_dirty", lambda: [])
    out = entry_mod.sync_check_hashes()
    assert out[victim] == entry_mod.query_hash(REGISTRY[victim])
    # same-version sidecar keeps non-newest entries untouched
    path.write_text(json.dumps({**stale, "__hash_version__": entry_mod._HASH_VERSION}))
    out2 = entry_mod.sync_check_hashes()
    newest = set()
    import glob as _g
    arts = sorted(_g.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    if arts:
        newest = set(json.loads(open(arts[-1]).read()))
    for name in out2:
        if name not in newest:
            assert out2[name] == "0" * 32, "non-newest entries must be preserved"


def test_dep_walk_reaches_through_registry_helpers():
    """A builder reaching package modules only via registry-level
    helper functions (the roundtrip queries) still hashes them:
    editing functions/exact.py must expire s11/orc credit
    (code-review r5 finding #1)."""
    import __spark_entry__ as e
    from geoscale_healthflow_etl_django_analytics_spark.registry import REGISTRY

    for q in ("orc_roundtrip_priority_revenue", "s11_json_export_roundtrip"):
        deps = e.query_dep_modules(REGISTRY[q])
        assert any(m.endswith("sources.catalog") for m in deps), (q, deps)
        assert any(m.endswith("functions.exact") for m in deps), (q, deps)


def test_dep_walk_resolves_package_init_relative_imports():
    """Relative imports inside a subpackage __init__ resolve against
    the package itself, not its parent (code-review r5 finding #2) —
    otherwise deps through re-exports silently vanish."""
    import __spark_entry__ as e

    pkg = "geoscale_healthflow_etl_django_analytics_spark"
    deps = e._module_direct_deps(f"{pkg}.sources")
    assert f"{pkg}.sources.catalog" in deps, deps


def test_never_checked_queries_outrank_expired_ones():
    """A query with NO row in any artifact sorts before one whose past
    green credit merely expired — new queries must reach the driver's
    50-entry window in their first round."""
    import __spark_entry__ as e

    order = list(e.queries())
    ever = e._artifact_green()
    fresh = [n for n in order if n not in ever]
    if fresh:  # every fresh query precedes every stale/checked one
        last_fresh = max(order.index(n) for n in fresh)
        assert last_fresh == len(fresh) - 1
