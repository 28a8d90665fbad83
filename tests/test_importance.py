"""DSIR-style hashed-ngram importance resampling
(operators/importance.py) — selection semantics + determinism + plan
shape. Cross-engine exactness is pinned by q144's DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.importance import (
    hashed_ngram_importance,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_outscore_raw_like_docs(spark):
    """Planted corpus: target docs speak language A, raw docs speak
    language B; a held-out A-speaking raw doc must score far above the
    B-speaking raw docs (the whole point of DSIR)."""
    a = "alpha beta gamma delta epsilon zeta"
    b = "one two three four five six seven"
    rows = [(i, a) for i in range(10)]            # target domain (ids 0-9)
    rows += [(100 + i, b) for i in range(20)]     # raw pool, off-domain
    rows += [(999, a)]                            # raw, but target-LIKE
    docs = _docs(spark, rows)
    out = {
        r["doc_id"]: r
        for r in hashed_ngram_importance(
            docs, is_target=F.col("doc_id") < 10
        ).collect()
    }
    assert out[999]["avg_lr_micros"] > 5 * out[100]["avg_lr_micros"]
    assert out[999]["band"] > out[100]["band"]


def test_every_doc_gets_a_row_short_docs_zeroed(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "")])
    out = {
        r["doc_id"]: r
        for r in hashed_ngram_importance(
            docs, is_target=F.col("doc_id") == 1
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    for i in (2, 3):  # < 2 tokens -> zeros, band 0, still a decision row
        assert out[i]["n_bigrams"] == 0
        assert out[i]["score_micros"] == 0
        assert out[i]["avg_lr_micros"] == 0
        assert out[i]["band"] == 0
    assert out[1]["n_bigrams"] == 2


def test_selection_deterministic_and_band_rates_ordered(spark):
    """Re-running selects the identical subset, and higher bands keep a
    larger fraction (the quality tilt)."""
    rows = [(i, f"tok{i % 5} tok{(i + 1) % 5} tok{(i + 2) % 5}")
            for i in range(400)]
    docs = _docs(spark, rows)

    def run():
        return {
            r["doc_id"]: (r["band"], r["selected"])
            for r in hashed_ngram_importance(
                docs,
                is_target=F.col("doc_id") % 2 == 0,
                band_thresholds=(900_000,),
                rates_permille=(100, 900),
            ).collect()
        }

    one, two = run(), run()
    assert one == two
    by_band: dict[int, list[bool]] = {}
    for band, sel in one.values():
        by_band.setdefault(band, []).append(sel)
    # identical-mix corpus: every doc shares one band; if both bands
    # materialize, the 900-permille band must keep a larger share
    if len(by_band) == 2:
        r0 = sum(by_band[0]) / len(by_band[0])
        r1 = sum(by_band[1]) / len(by_band[1])
        assert r1 > r0


def test_rates_must_cover_every_band(spark):
    docs = _docs(spark, [(1, "a b")])
    try:
        hashed_ngram_importance(
            docs,
            is_target=F.lit(True),
            band_thresholds=(1, 2),
            rates_permille=(100,),
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_plan_broadcasts_ratio_table(spark):
    """The num_buckets-row likelihood-ratio table must broadcast back
    onto the bigram stream — a shuffle join there would re-shuffle the
    whole corpus on bucket a second time."""
    docs = _docs(spark, [(i, "a b c d") for i in range(10)])
    plan = (
        hashed_ngram_importance(docs, is_target=F.col("doc_id") < 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
