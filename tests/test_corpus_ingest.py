"""Streaming corpus ingestion (streaming/corpus_ingest.py): real
file-source stream with availableNow, batch-equivalence, cross-batch
dedup, and replay idempotence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
    ingest_corpus_batch,
    run_corpus_ingest_stream,
)

ROWS = [
    # (doc_id, text) — texts engineered so some repeat across drops
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    (4, "sphinx of black quartz judge my vow"),
    (5, "how vexingly quick daft zebras jump"),
    (6, "pack my box with five dozen liquor jugs"),      # dup of 2
    (7, "jived fox nymph grabs quick waltz"),
    (8, "the five boxing wizards jump quickly"),
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write_drops(spark, src_dir):
    os.makedirs(src_dir, exist_ok=True)
    half = len(ROWS) // 2
    for d, chunk in enumerate((ROWS[:half], ROWS[half:])):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            f"{src_dir}/_stage{d}"
        )
        part = next(
            f
            for f in os.listdir(f"{src_dir}/_stage{d}")
            if f.endswith(".parquet")
        )
        os.rename(
            f"{src_dir}/_stage{d}/{part}", f"{src_dir}/drop{d}.parquet"
        )


def _expected_ids(spark):
    """Batch-computed expectation: quality keepers, lowest doc_id per
    text."""
    docs = _docs(spark, ROWS)
    keep = {
        r["doc_id"]
        for r in hashed_linear_score(
            docs, synthetic_weights(spark, 4096), num_buckets=4096
        ).collect()
        if r["keep"]
    }
    first_by_text = {}
    for i, t in ROWS:
        if i in keep and (t not in first_by_text or i < first_by_text[t]):
            first_by_text[t] = i
    return set(first_by_text.values())


def test_stream_ingest_matches_batch_and_dedups_across_drops(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    target = str(tmp_path / "corpus")
    _write_drops(spark, src)
    run_corpus_ingest_stream(
        spark, src, target, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(target)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == _expected_ids(spark)
    # corpus texts are unique and the ledger column exists
    n = got.count()
    assert got.select("text_md5").distinct().count() == n
    assert got.filter(F.md5("text") != F.col("text_md5")).count() == 0


def test_replayed_batch_appends_nothing(spark, tmp_path):
    """At-least-once replay safety: re-ingesting the same batch adds
    zero rows — its texts are already in the ledger."""
    target = str(tmp_path / "corpus")
    batch = _docs(spark, ROWS[:4])
    ingest_corpus_batch(batch, target)
    before = spark.read.parquet(target).count()
    assert before > 0
    ingest_corpus_batch(batch, target)  # crash-replay of the same batch
    assert spark.read.parquet(target).count() == before
