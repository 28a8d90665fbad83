"""Token-budget sequence packing for LLM training shards.

Groups documents into fixed-token-budget packs — the preprocessing step
that turns a curated corpus into context-window-sized training
sequences. True first-fit-decreasing bin packing is inherently
sequential; the scalable variant used here is running-sum binning:
within each partition key, documents are laid out in a deterministic
order and a pack boundary is drawn every time the cumulative token
count crosses the budget. A pack may exceed the budget by at most one
document (the straddler) — the standard trade accepted by streaming
packers, documented here as the contract.

Scale: one window per partition key (hash shuffle on the key, sort
within). With ``partition_cols=["shard"]`` from
:func:`..operators.sampling.assign_shards`, window state is bounded per
shard and all shards pack in parallel — no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    order_col: str,
    token_col: str,
    budget: int,
    partition_cols: list[str] | None = None,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row a ``pack_col`` bin so consecutive rows (in
    ``order_col`` order, per ``partition_cols`` group) share a pack
    until the token budget fills.

    pack = floor(exclusive_cumsum(tokens) / budget): the first document
    of each pack is the one whose predecessors exactly filled (or
    overflowed) the previous budget multiple.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    parts = partition_cols or []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(
        F.sum(F.col(token_col)).over(w), F.lit(0).cast("long")
    )
    return df.withColumn(
        pack_col, F.floor(cum_before / budget).cast("long")
    )
