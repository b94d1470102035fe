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
