"""Vocabulary building + token-id encoding — the tokenize-to-ids step
of a training-data pipeline (a whitespace tokenizer stands in for BPE;
a learned merge table plugs into the same two-operator shape).

Scale: the vocabulary is one token-count aggregation + a top-V rank
(V rows — broadcastable by construction); encoding is an explode +
broadcast join + re-assembly, all keyed by doc_id so the regroup is
one shuffle. Nothing is driver-side; ids are dense ranks with a
deterministic (count DESC, token ASC) tiebreak so the same corpus
always yields the same vocabulary in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokens_with_pos(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) — whitespace tokens with 1-based positions,
    empty tokens dropped (mirrors split-on-single-space semantics)."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "token"),
        )
        .filter(F.col("token") != "")
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "token")
    )


def build_vocab(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 1000
) -> DataFrame:
    """Top-``vocab_size`` tokens by corpus frequency as (token, token_id)
    with dense ids 0..V-1 (count DESC, token ASC tiebreak)."""
    counts = (
        tokens_with_pos(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-V first via orderBy+limit (TakeOrderedAndProject — a
    # DISTRIBUTED partial top-k, map-side pruned), THEN the dense-rank
    # window over only V rows. A global rank window over all distinct
    # tokens would be a single-partition sort of the whole vocabulary
    # candidate space — the scale bottleneck this avoids.
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.withColumn("token_id", F.row_number().over(w) - 1)
        .select("token", F.col("token_id").cast("long").alias("token_id"))
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    unk_id: int | None = None,
) -> DataFrame:
    """(id, pos, token_id) — each document's token stream encoded
    against ``vocab``; out-of-vocabulary tokens map to ``unk_id``
    (default: |vocab|, the next free id).

    Prefer passing ``unk_id`` explicitly (callers know their
    vocab_size); the default derives it with a count(), which
    materializes the vocab once (eager localCheckpoint) so the count
    and the broadcast join share ONE computation instead of re-running
    the full corpus aggregation per consumer."""
    if unk_id is None:
        vocab = vocab.localCheckpoint(eager=True)
        unk_id = vocab.count()
    toks = tokens_with_pos(df, id_col, text_col)
    return toks.join(F.broadcast(vocab), "token", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(unk_id))
        .cast("long")
        .alias("token_id"),
    )
