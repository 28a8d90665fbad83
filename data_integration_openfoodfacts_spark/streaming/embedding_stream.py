"""Streaming embedding ingest — `operators/embedding_ingest.py` as a
Structured Streaming job (round-9 continuation, completing the
modality symmetry with the text paths `novelty_ingest` /
`corpus_ingest`): each micro-batch of new vectors dedups against the
persisted eb-bucketed hyperplane-signature ledger, survivors append
to a vector store, their signatures to the ledger.

Crash-replay semantics (foreachBatch appends are at-least-once): the
ledger append runs FIRST and makes replays idempotent at signature
granularity — a replayed batch's vectors collide with their own
ledgered signatures, so the survivor set of a replay is empty and the
store cannot double-append... EXCEPT in the crash window between the
ledger append and the store append, where a vector can be ledgered
but not stored. That direction is deliberate and mirrors the
text-path trade in reverse: an embedding DEDUP ledger exists to stop
near-duplicates — a ledgered-but-unstored vector suppresses future
near-dups of itself (conservative: the corpus loses one
representative), while the reverse order would re-ADMIT a duplicate
on replay (corrupting: the corpus gains one). Text ingest orders the
other way because its heal pass can re-derive signatures from stored
text; embedding signatures are derived from the vector itself, which
the store may not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.embedding_ingest import (
    EB_COL,
    EMB_LEDGER_BUCKETS,
    compact_embedding_bands,
    incremental_embedding_dedup,
)

EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def ingest_embedding_batch(
    batch: DataFrame,
    store_path: str,
    ledger_path: str,
    dim: int,
    rows_per_band: int = 16,
    num_bands: int = 8,
    n_buckets: int = EMB_LEDGER_BUCKETS,
) -> None:
    """One micro-batch: dedup against the ledger (appending the
    surviving signatures — `incremental_embedding_dedup`), then append
    the surviving vectors to the store."""
    survivors, _ = incremental_embedding_dedup(
        batch,
        ledger_path,
        dim,
        rows_per_band=rows_per_band,
        num_bands=num_bands,
        n_buckets=n_buckets,
        append=True,
    )
    # bounded by the batch; coalesce keeps the store's file count at
    # one per trigger instead of one per shuffle partition
    survivors.coalesce(1).write.mode("append").parquet(store_path)


def run_embedding_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    ledger_path: str,
    checkpoint_dir: str,
    dim: int,
    rows_per_band: int = 16,
    num_bands: int = 8,
    n_buckets: int = EMB_LEDGER_BUCKETS,
    max_files_per_trigger: int | None = 1,
    compact_files_every: int | None = None,
) -> None:
    """availableNow backlog drain through the embedding dedup ingest.

    ``compact_files_every``: every N triggers, rewrite the signature
    ledger to one file per bucket (`compact_embedding_bands` — same
    cadence contract as the text streams; appends grow the ledger by
    one file per touched bucket per batch)."""

    def _batch(b: DataFrame, bid: int) -> None:
        ingest_embedding_batch(
            b, store_path, ledger_path, dim,
            rows_per_band=rows_per_band, num_bands=num_bands,
            n_buckets=n_buckets,
        )
        if compact_files_every and (bid + 1) % compact_files_every == 0:
            from ..operators.bucketed_ledger import store_n_buckets

            compact_embedding_bands(
                spark,
                ledger_path,
                n_buckets=store_n_buckets(
                    spark, ledger_path, EB_COL, n_buckets
                ),
            )

    stream = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option(
            "maxFilesPerTrigger", max_files_per_trigger
        ).parquet(source_dir)
        if max_files_per_trigger
        else spark.readStream.schema(EMB_STREAM_SCHEMA).parquet(source_dir)
    )
    (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
