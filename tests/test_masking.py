"""T5-style span corruption (operators/masking.py) — reconstruction
round-trip, determinism, edge cases, zero-shuffle plan. Cross-engine
byte-exactness is pinned by q146's DuckDB oracle."""

from __future__ import annotations

import re

from data_integration_openfoodfacts_spark.operators.masking import (
    span_corruption,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reconstruct(input_text: str, target_text: str) -> str:
    """Inverse of span corruption: substitute every <X_k> in the input
    with the tokens its target section hides."""
    spans: dict[str, str] = {}
    parts = re.split(r"(<X_\d+>)", target_text)
    # parts = ['', '<X_0>', ' tok tok ', '<X_1>', ' tok', ...]
    for i in range(1, len(parts), 2):
        spans[parts[i]] = parts[i + 1].strip()
    out = []
    for tok in input_text.split(" "):
        out.append(spans[tok] if tok in spans else tok)
    return " ".join(x for x in out if x != "")


def test_round_trip_reconstructs_original(spark):
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(1 + (i * 7) % 23)))
        for i in range(50)
    ]
    docs = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in span_corruption(docs, fingerprint_input=False).collect()
    }
    originals = dict(rows)
    assert set(out) == set(originals)
    for i, r in out.items():
        assert _reconstruct(r["input_text"], r["target_text"]) == originals[i]


def test_counts_consistent_and_sentinels_ordered(spark):
    docs = _docs(
        spark, [(i, " ".join(f"t{j}" for j in range(40))) for i in range(30)]
    )
    rows = span_corruption(docs, fingerprint_input=False).collect()
    assert any(r["n_spans"] > 0 for r in rows)  # 300 permille over 8 blocks
    for r in rows:
        ins = re.findall(r"<X_(\d+)>", r["input_text"])
        tgs = re.findall(r"<X_(\d+)>", r["target_text"])
        # sentinels appear once each, in order, same set both sides
        assert ins == tgs == [str(k) for k in range(r["n_spans"])]
        # masked token count == tokens in the target minus sentinels
        assert r["n_masked"] == len(r["target_text"].split()) - r[
            "n_spans"
        ] if r["n_spans"] else r["n_masked"] == 0
        assert 0 <= r["n_masked"] <= r["n_tokens"]


def test_empty_and_tiny_docs(spark):
    docs = _docs(spark, [(1, ""), (2, "one"), (3, "a b")])
    out = {
        r["doc_id"]: r
        for r in span_corruption(docs, fingerprint_input=False).collect()
    }
    assert out[1]["n_tokens"] == 0
    assert out[1]["n_spans"] == 0
    assert out[1]["input_text"] == ""
    assert out[1]["target_text"] == ""
    for i in (2, 3):  # span capped at doc length; round-trip holds
        r = out[i]
        assert _reconstruct(r["input_text"], r["target_text"]) in (
            "",
            "one",
            "a b",
        )


def test_deterministic_across_runs_and_layout(spark):
    docs = _docs(
        spark, [(i, " ".join(f"t{j}" for j in range(25))) for i in range(100)]
    )
    a = sorted(
        (r["doc_id"], r["input_md5"], r["target_text"])
        for r in span_corruption(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["input_md5"], r["target_text"])
        for r in span_corruption(docs.repartition(13)).collect()
    )
    assert a == b


def test_zero_shuffle_plan(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    plan = (
        span_corruption(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure narrow preprocessing


def test_invalid_params_rejected(spark):
    docs = _docs(spark, [(1, "a")])
    for kwargs in ({"block": 0}, {"max_span": 0}, {"max_span": 9}):
        try:
            span_corruption(docs, **kwargs)
            raise AssertionError(f"expected ValueError for {kwargs}")
        except ValueError:
            pass
