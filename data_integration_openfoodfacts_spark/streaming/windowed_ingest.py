"""Streaming runner for the time-windowed ledger — rolling-window
crawl dedup as an availableNow drain.

Completes the stream-runner symmetry: every persisted store in this
engine (corpus md5 ledger, band ledger, novelty ledger, bit screen,
counting store, embedding ledger) has a foreachBatch runner; this is
the windowed ledger's. Each micro-batch:

1. scores its keys against the CURRENT retention window and writes the
   per-batch novelty totals FIRST, ``mode("ignore")`` per batch-id —
   first-writer-wins, so a replay after the epoch landed (which would
   recompute all-seen totals) is discarded, the
   `counting_store.screen_keys_batch` crash-window argument verbatim;
2. appends the batch's keys as epoch ``batch_id`` (completed-directory
   idempotence + torn-write repair from `operators/windowed_ledger`);
3. optionally EXPIRES epochs older than ``keep_epochs`` — the rolling
   window: expiry is a directory drop guarded by the resurrection
   watermark, so the store's footprint is bounded by the window, not
   by stream lifetime, and no compaction pass is ever needed.

Replaying the whole stream from a fresh checkpoint is a no-op end to
end: totals are first-writer-wins, live-epoch appends find completed
directories, expired-epoch appends are refused by the watermark.
Single-writer contract as for every store in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windowed_ledger import (
    append_window_epoch,
    expire_through,
    score_tranche_windowed,
)

__all__ = ["screen_batch_windowed", "run_windowed_ingest_stream"]


def screen_batch_windowed(
    keys: DataFrame,
    key_col: str,
    ledger_path: str,
    results_path: str,
    batch_id: int,
    n_buckets: int = 64,
    keep_epochs: int | None = None,
) -> None:
    """One micro-batch through the rolling window (the foreachBatch
    body, callable directly for batch/stream parity tests)."""
    flags = score_tranche_windowed(keys, key_col, ledger_path)
    totals = flags.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(
            F.sum((~F.col("seen_in_window")).cast("long")), F.lit(0)
        ).cast("long").alias("n_novel"),
        F.coalesce(
            F.sum(F.col("seen_in_window").cast("long")), F.lit(0)
        ).cast("long").alias("n_seen"),
    ).select(F.lit(int(batch_id)).cast("long").alias("batch_id"), "*")
    totals.coalesce(1).write.mode("ignore").parquet(
        f"{results_path}/batch_id={batch_id}"
    )
    append_window_epoch(
        keys, key_col, ledger_path, int(batch_id), n_buckets
    )
    if keep_epochs is not None and int(batch_id) - keep_epochs >= 0:
        expire_through(
            keys.sparkSession, ledger_path, int(batch_id) - keep_epochs
        )


def run_windowed_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    ledger_path: str,
    results_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
    n_buckets: int = 64,
    keep_epochs: int | None = None,
) -> None:
    """availableNow backlog drain: one epoch per micro-batch, keyed by
    exact-text md5 (the keep-latest family's key), rolling expiry at
    ``keep_epochs`` behind the head."""
    from .corpus_ingest import read_docs_stream

    def _batch(b: DataFrame, bid: int) -> None:
        screen_batch_windowed(
            b.select(F.md5("text").alias("text_md5")),
            "text_md5", ledger_path, results_path,
            batch_id=bid, n_buckets=n_buckets, keep_epochs=keep_epochs,
        )

    stream = read_docs_stream(spark, source_dir, max_files_per_trigger)
    (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
