"""Exact-substring duplicate detection / boilerplate removal
(operators/substring_dedup.py): hand-built corpora with known shared
passages, verified against hand-computed window and chunk arithmetic."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.operators.substring_dedup import (
    duplicate_window_stats,
    remove_repeated_chunks,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_window_stats_shared_passage(spark):
    # docs 1 and 2 share the 8-token run "a b c d e f g h" exactly once
    # each; doc 3 is unrelated; doc 4 is shorter than the window.
    shared = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, f"x1 x2 {shared} y1 y2"),
            (2, f"{shared} z1 z2 z3"),
            (3, "p q r s t u v w p q r s"),
            (4, "too short"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["dup_tokens"])
        for r in duplicate_window_stats(docs, window=8).collect()
    }
    # doc 1: 12 tokens, exactly one duplicated window (positions 3-10)
    assert got[1] == (12, 1, 8)
    # doc 2: 11 tokens, duplicated window at positions 1-8
    assert got[2] == (11, 1, 8)
    # doc 3: its repeated 4-token phrase is below the window size and
    # repeats only WITHIN the doc — countDistinct(doc) < 2 → clean
    assert got[3] == (12, 0, 0)
    assert got[4] == (2, 0, 0)


def test_duplicate_window_coverage_unions_overlaps(spark):
    # docs share a 9-token run → each has TWO overlapping duplicated
    # 8-windows whose union covers 9 positions, not 16.
    shared = "a b c d e f g h i"
    docs = _docs(spark, [(1, shared), (2, f"{shared} tail")])
    got = {
        r["doc_id"]: (r["dup_windows"], r["dup_tokens"])
        for r in duplicate_window_stats(docs, window=8).collect()
    }
    assert got[1] == (2, 9)
    assert got[2] == (2, 9)


def test_remove_repeated_chunks_strips_and_rebuilds(spark):
    # chunk size 2: "b1 b2" is the boilerplate chunk (docs 1 and 2,
    # chunk-aligned in both); doc 3 contains the same words but NOT
    # chunk-aligned, so it keeps its text.
    docs = _docs(
        spark,
        [
            (1, "b1 b2 u1 u2 u3"),
            (2, "v1 v2 b1 b2"),
            (3, "x b1 b2 y"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["removed_chunks"], r["clean_text"])
        for r in remove_repeated_chunks(docs, chunk=2, min_docs=2).collect()
    }
    assert got[1] == (3, 1, "u1 u2 u3")
    assert got[2] == (2, 1, "v1 v2")
    assert got[3] == (2, 0, "x b1 b2 y")


def test_remove_repeated_chunks_all_boilerplate_and_empty(spark):
    docs = _docs(spark, [(1, "b1 b2"), (2, "b1 b2"), (3, "")])
    got = {
        r["doc_id"]: (r["n_chunks"], r["removed_chunks"], r["clean_text"])
        for r in remove_repeated_chunks(docs, chunk=2, min_docs=2).collect()
    }
    assert got[1] == (1, 1, "")
    assert got[2] == (1, 1, "")
    assert got[3] == (0, 0, "")


def test_remove_repeated_chunks_preserves_order(spark):
    # multiple surviving chunks must rejoin in original order even
    # though they pass through a groupBy (array_sort over (c, text)).
    docs = _docs(
        spark,
        [
            (1, "k1 k2 b1 b2 k3 k4 k5"),
            (2, "b1 b2 other words"),
        ],
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_chunks(docs, chunk=2, min_docs=2).collect()
    }
    assert got[1] == "k1 k2 k3 k4 k5"
