"""Gate-window rotation: least-recently-verified queries must reach the
driver's 50-entry correctness window without hand-editing _PRIORITY."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.plans import registry


def test_never_verified_come_first():
    all_keys = set(registry._ALL_QUERIES)
    verified = sorted(all_keys)[:40]
    records = {
        2: {k: {"rows_match": True, "hash_match": True} for k in verified}
    }
    order = registry._gate_order(records)
    unverified = [k for k in order if k not in verified]
    assert order[: len(unverified)] == unverified


def test_red_record_resets_to_front():
    all_keys = sorted(registry._ALL_QUERIES)
    records = {
        2: {k: {"hash_match": True} for k in all_keys},
        3: {all_keys[10]: {"hash_match": False}},
    }
    order = registry._gate_order(records)
    assert order[0] == all_keys[10]


def test_older_rounds_rotate_before_newer():
    all_keys = sorted(registry._ALL_QUERIES)
    old, new = all_keys[: len(all_keys) // 2], all_keys[len(all_keys) // 2 :]
    records = {
        2: {k: {"hash_match": True} for k in old},
        3: {k: {"hash_match": True} for k in new},
    }
    order = registry._gate_order(records)
    pos = {k: i for i, k in enumerate(order)}
    assert max(pos[k] for k in old) < min(pos[k] for k in new)


def test_fallback_is_static_priority(monkeypatch):
    def boom():
        raise OSError("no fs")

    monkeypatch.setattr(registry, "_load_correctness_records", boom)
    order = registry._gate_order(None)
    assert order[: len(registry._PRIORITY)] == registry._PRIORITY
    assert set(order) == set(registry._ALL_QUERIES)


def test_live_order_covers_all_queries():
    assert set(registry.QUERIES) == set(registry._ALL_QUERIES)
    assert set(registry.ORACLES) == set(registry._ALL_ORACLES)
    # current round: everything un-verified-in-r02 (incl. all new
    # queries) must sit inside the 50-entry window
    window = list(registry.QUERIES)[:50]
    for q in ("q75_semantic_dedup", "q78_bigram_prob_scores",
              "q82_triangle_counts", "q17_run_metrics"):
        assert q in window
