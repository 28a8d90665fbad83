"""End-to-end corpus near-duplicate removal."""

from __future__ import annotations

import pytest

from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    dedup_near_duplicates,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup
    (3, "the quick brown fox jumps over the lazy cat tonight"),  # near dup
    (4, "completely different content about spark query engines here"),
    (5, "another unrelated document discussing window functions only"),
]


@pytest.mark.parametrize("use_lsh", [False, True])
def test_dedup_keeps_canonical_and_uniques(spark, use_lsh):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = dedup_near_duplicates(
        df, "doc_id", "text", threshold=0.5, use_lsh=use_lsh
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1,2,3 form one near-dup cluster -> min id 1 survives; 4,5 untouched
    assert kept == [1, 4, 5]


def test_dedup_noop_on_distinct_corpus(spark):
    df = spark.createDataFrame(DOCS[3:], ["doc_id", "text"])
    out = dedup_near_duplicates(df, "doc_id", "text", threshold=0.5)
    assert out.count() == 2
