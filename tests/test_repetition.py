"""Word-repetition signals (`operators/repetition.py`): exact counts
on crafted documents, flag thresholds, short/empty edge rows, and the
no-shuffle-beyond-doc-key plan claim."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.repetition import (
    repetition_flags,
    word_repetition_signals,
)


def _sig(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in repetition_flags(
            word_repetition_signals(df, "doc_id", "text")
        ).collect()
    }


def test_exact_counts_and_flags(spark):
    got = _sig(
        spark,
        [
            # 0: diverse — everything passes
            "the quick brown fox jumps over a lazy dog tonight",
            # 1: 'a b' x3 in 6 words: dup_words 4/6 fails, top2 3/5 fails
            "a b a b a b",
            # 2: 5-word phrase repeated 3x: dup5 = (3-1) + 4*(2-1) = 6
            #    of 11 grams -> fails 0.15; top2 (x y: 3 of 14) fails
            "x y z w v x y z w v x y z w v",
            # 3: single word — gram rules trivially pass
            "hello",
        ],
    )
    d0 = got[0]
    assert d0["dup_words"] == 0 and d0["top2_count"] <= 1
    assert d0["r_top_2gram"] and d0["r_dup_5gram"] and d0["r_dup_words"]

    d1 = got[1]
    assert (d1["n_words"], d1["dup_words"], d1["top2_count"]) == (6, 4, 3)
    assert d1["dup5_count"] == 0  # both 5-grams distinct
    assert not d1["r_dup_words"] and not d1["r_top_2gram"]
    assert d1["r_dup_5gram"]

    d2 = got[2]
    assert (d2["n_words"], d2["top2_count"], d2["dup5_count"]) == (15, 3, 6)
    assert not d2["r_dup_5gram"]  # 6*20 > (15-4)*3
    assert not d2["r_top_2gram"]  # 3*5 > 14

    d3 = got[3]
    assert (d3["n_words"], d3["top2_count"], d3["dup5_count"]) == (1, 0, 0)
    assert d3["r_top_2gram"] and d3["r_dup_5gram"] and d3["r_dup_words"]


def test_null_text_yields_zero_row_not_missing(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in word_repetition_signals(df).collect()
    }
    assert set(got) == {1, 2}
    # split('', ' ') -> [''] : one empty token, zero grams
    assert got[1]["top2_count"] == 0 and got[1]["dup5_count"] == 0


def test_plan_shuffles_only_on_doc_key(spark):
    """The gram aggregation shuffles on (doc, k, gram) then (doc) —
    no join of the corpus against itself, no cartesian node."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    plan = (
        word_repetition_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
