"""Streaming shingle-novelty scoring — q159's ledger pattern as a
Structured Streaming job: each micro-batch of crawl documents is
scored against the PERSISTED (shingle_md5, first_doc) ledger with
O(batch) shingle work + one anti-join, its first-occurrences append to
the ledger, and one (batch_id, n_docs, n_shingles, n_novel) totals row
lands in a results store — the live form of the Lee et al. 2022
marginal-novelty curve, per crawl snapshot instead of per decile.

Crash-replay semantics (foreachBatch is at-least-once):

- Totals are computed BEFORE the ledger append, always against the
  pre-batch ledger, and written per-batch with ``mode("ignore")``
  (first-writer-wins, the corpus_ingest run-ledger pattern) — a
  replayed batch recomputes identical totals if the original append
  never ran, and a replay AFTER a partial/complete append cannot
  overwrite the original attempt's correct row.
- The ledger append is idempotent at shingle granularity: a replay's
  anti-join drops every shingle the first attempt already appended,
  so partial appends self-complete without duplicate keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.novelty_ledger import (
    DEFAULT_BUCKETS,
    append_ledger_delta,
    compact_ledger_path,
    score_tranche_against_ledger,
)
from .corpus_ingest import DOCS_STREAM_SCHEMA, read_docs_stream

__all__ = ["novelty_score_batch", "run_novelty_stream", "DOCS_STREAM_SCHEMA"]


def novelty_score_batch(
    batch: DataFrame,
    ledger_path: str,
    results_path: str,
    batch_id: int,
    n: int = 8,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Score one micro-batch against the persisted ledger, append its
    first-occurrences, record its totals row.

    The ledger is key-bucket-partitioned parquet
    (`operators/novelty_ledger.py`, round-7 VERDICT #1): the
    membership scan prunes to the buckets this batch's shingles touch,
    and the batch's distinct keys are broadcast against it — the
    ledger is never shuffled, sorted, or broadcast."""
    from ..operators.bucketed_ledger import store_n_buckets
    from ..operators.novelty_ledger import KB_COL

    # the ledger's OWN layout wins over the caller's constant: a
    # stream pointed at a ledger created with a different bucket count
    # keeps that layout (the caller's n_buckets only sizes a brand-new
    # ledger); a mismatched DIRECT append still refuses loudly inside
    # append_ledger_delta (round-8 ADVICE)
    n_buckets = store_n_buckets(
        batch.sparkSession, ledger_path, KB_COL, n_buckets
    )
    per_doc, new_firsts = score_tranche_against_ledger(
        batch, ledger_path, "doc_id", "text", n=n, n_buckets=n_buckets
    )
    totals = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_shingles"), F.lit(0)).cast("long").alias(
            "n_shingles"
        ),
        F.coalesce(F.sum("n_novel"), F.lit(0)).cast("long").alias(
            "n_novel"
        ),
    ).select(F.lit(batch_id).cast("long").alias("batch_id"), "*")
    # totals FIRST (vs the pre-batch ledger), then the append — see
    # module docstring for the crash-window argument
    totals.coalesce(1).write.mode("ignore").parquet(
        f"{results_path}/batch_id={batch_id}"
    )
    append_ledger_delta(new_firsts, ledger_path, n_buckets=n_buckets)


def run_novelty_stream(
    spark: SparkSession,
    source_dir: str,
    ledger_path: str,
    results_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = 1,
    compact_files_every: int | None = None,
) -> None:
    """availableNow backlog drain through the novelty scorer.

    ``compact_files_every``: every N triggers, rewrite the ledger to
    one file per bucket (``compact_ledger_path`` — round-9 VERDICT #1,
    mirroring the near-dup ingest's cadence). Appends grow the ledger
    by one file per touched bucket per batch; without a cadence a
    long-running stream accumulates O(batches x buckets) small files.
    Runs AFTER the batch's own writes — the compaction's staged
    write-then-swap keeps a crash mid-compaction from losing the
    ledger, and a replayed trigger just re-compacts."""

    def _batch(b: DataFrame, bid: int) -> None:
        novelty_score_batch(b, ledger_path, results_path, batch_id=bid)
        if compact_files_every and (bid + 1) % compact_files_every == 0:
            from ..operators.bucketed_ledger import store_n_buckets
            from ..operators.novelty_ledger import KB_COL

            compact_ledger_path(
                spark,
                ledger_path,
                n_buckets=store_n_buckets(
                    spark, ledger_path, KB_COL, DEFAULT_BUCKETS
                ),
            )

    stream = read_docs_stream(spark, source_dir, max_files_per_trigger)
    (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
