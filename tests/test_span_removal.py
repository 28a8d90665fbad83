"""Span-granular exact-substring removal
(`operators/substring_dedup.py::remove_duplicate_spans`, round-9
VERDICT #7): span-exact cuts, reassembly round-trip, and the
counted-there / cut-here invariant against duplicate_window_stats."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.operators.substring_dedup import (
    duplicate_window_stats,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_planted_span_cut_exact(spark):
    """Two docs share an 8-token run embedded in distinct contexts:
    exactly that run (and nothing else) is cut from both; a third
    unrelated doc passes through byte-identical."""
    shared = "one two three four five six seven eight"
    docs = _docs(
        spark,
        [
            (1, f"intro words {shared} outro tail"),
            (2, f"different opening {shared} and a different close"),
            (3, "nothing here repeats across any document at all"),
        ],
    )
    got = _by_id(remove_duplicate_spans(docs, window=8))
    assert got[1]["clean_text"] == "intro words outro tail"
    assert got[1]["removed_tokens"] == 8
    assert got[2]["clean_text"] == "different opening and a different close"
    assert got[2]["removed_tokens"] == 8
    assert got[3]["clean_text"] == (
        "nothing here repeats across any document at all"
    )
    assert got[3]["removed_tokens"] == 0


def test_long_run_cut_as_one_maximal_span(spark):
    """A duplicated run LONGER than the window is covered by a chain
    of duplicated windows — the union cut removes the whole maximal
    run, not just one window of it."""
    run = " ".join(f"t{i}" for i in range(12))  # 12-token shared run
    docs = _docs(
        spark,
        [(1, f"head {run} tail"), (2, f"other {run} ending words")],
    )
    got = _by_id(remove_duplicate_spans(docs, window=8))
    assert got[1]["clean_text"] == "head tail"
    assert got[1]["removed_tokens"] == 12
    assert got[2]["clean_text"] == "other ending words"


def test_removed_tokens_equals_dup_tokens(spark):
    """The invariant the gate leans on: removal cuts EXACTLY the
    interval union that duplicate_window_stats counts — per doc,
    removed_tokens == dup_tokens, including multi-span docs, fully
    duplicated docs, and short docs with no windows."""
    shared_a = "alpha beta gamma delta epsilon zeta eta theta"
    shared_b = "red orange yellow green blue indigo violet ultra"
    docs = _docs(
        spark,
        [
            (1, f"{shared_a} middle filler words {shared_b}"),
            (2, f"pre {shared_a} post"),
            (3, f"x y {shared_b} z w"),
            (4, shared_a),              # fully duplicated doc
            (5, f"opening {shared_a}"),
            (6, "short doc"),           # < window: no windows at all
        ],
    )
    stats = _by_id(duplicate_window_stats(docs, window=8))
    spans = _by_id(remove_duplicate_spans(docs, window=8))
    for d in stats:
        assert spans[d]["removed_tokens"] == stats[d]["dup_tokens"], d
        assert spans[d]["n_tokens"] == stats[d]["n_tokens"], d
    # the fully-duplicated doc reassembles to the empty string
    assert spans[4]["clean_text"] == ""
    assert spans[4]["removed_tokens"] == spans[4]["n_tokens"]


def test_reassembly_round_trip_without_duplicates(spark):
    """No cross-document duplication: every document reassembles to
    its whitespace-normalized self (tokens rejoined by single
    spaces), with zero removed tokens."""
    docs = _docs(
        spark,
        [
            (1, "a unique first sentence with enough tokens to window"),
            (2, "a wholly separate second text that shares no long run"),
            (3, "  leading and   multiple spaces collapse to  single "),
        ],
    )
    got = _by_id(remove_duplicate_spans(docs, window=8))
    for r in got.values():
        assert r["removed_tokens"] == 0
    assert got[3]["clean_text"] == (
        "leading and multiple spaces collapse to single"
    )
