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
    # Stable across rounds: every query the LIVE records have never
    # seen green must sit inside the 50-entry gate window (as long as
    # fewer than 50 such queries exist). Asserting specific names here
    # would break the moment the next round's record lands — which is
    # the rotation working, not failing.
    records = registry._load_correctness_records()
    order = registry._gate_order(records)
    greens = set()
    for rnd in sorted(records):
        for key, rec in records[rnd].items():
            if isinstance(rec, dict) and (
                rec.get("hash_match")
                or (key not in registry._ALL_ORACLES and rec.get("rows_match"))
            ):
                greens.add(key)
            else:
                greens.discard(key)
    unverified = [k for k in registry._ALL_QUERIES if k not in greens]
    window = set(order[:50])
    for q in unverified[: 50]:
        assert q in window, q


def test_force_gate_overrides_green_record(monkeypatch):
    all_keys = sorted(registry._ALL_QUERIES)
    records = {2: {k: {"hash_match": True} for k in all_keys}}
    target = all_keys[-1]
    monkeypatch.setattr(registry, "_FORCE_GATE", {target})
    order = registry._gate_order(records)
    assert order[0] == target


def test_corrupt_record_file_is_isolated(tmp_path, monkeypatch):
    import json

    good = {k: {"hash_match": True} for k in sorted(registry._ALL_QUERIES)[:10]}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r02.json").write_text('{"truncated')
    import glob as glob_mod

    real_glob = glob_mod.glob
    monkeypatch.setattr(
        glob_mod,
        "glob",
        lambda pat: real_glob(str(tmp_path / "CORRECTNESS_r*.json"))
        if "CORRECTNESS_r" in pat
        else real_glob(pat),
    )
    records = registry._load_correctness_records()
    assert list(records) == [1]  # r02 skipped, r01 intact
