"""Rank fusion — combining heterogeneous quality signals by RANK, not
by value.

A curation pipeline ends up with many per-document signals on
incompatible scales (a length count, a classifier logit, a repetition
ratio, a perplexity bucket). Averaging raw values lets one scale
dominate and bakes in unit choices; fusing RANKS is scale-free and is
the standard ensemble move (Borda counts; reciprocal-rank fusion from
the retrieval literature). Both fusions here are INTEGER-exact so any
engine reproduces them bit-for-bit:

- **Borda**: per-signal ``dense_rank`` (1 = best; ties share a rank,
  so no arbitrary intra-tie order leaks into the score), summed.
  Lower is better.
- **Fixed-point RRF**: ``sum(floor(SCALE / (K + rank)))`` — the
  classic ``1/(k+rank)`` with the division carried in exact integer
  fixed point instead of floats, because a float RRF sum is
  accumulation-order-dependent and cross-engine-unhashable (the repo's
  determinism rule). K=60 per the original RRF paper; higher is better.

Scale posture: one window per signal over the full table — each is a
single hash-shuffle on the (empty) partition key... which at 100 TB is
the real concern: a GLOBAL dense_rank has a single-reducer sort. The
operator therefore ranks WITHIN a caller-supplied partition column
when given (per-language / per-source fusion — the common case, each
partition sorts in parallel), and callers fusing globally at extreme
scale should first bucket signals (`F.ntile` or histogram buckets)
exactly as q141's incremental quantiles do. The fusion arithmetic
itself is a narrow projection + one final ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rank_fuse"]

RRF_K = 60
RRF_SCALE = 10_000


def rank_fuse(
    df: DataFrame,
    id_col: str,
    signals: list[tuple[str, bool]],
    partition_by: str | None = None,
) -> DataFrame:
    """Add ``borda`` (sum of per-signal dense ranks, lower = better)
    and ``rrf_fp`` (fixed-point reciprocal-rank fusion, higher =
    better) over ``signals`` = [(column, higher_is_better), ...].
    Both are exact integers; the caller breaks final ties with a
    unique key (md5 of the id is this engine's convention)."""
    if not signals:
        raise ValueError("rank_fuse needs at least one signal")
    out = df
    rank_cols = []
    for col, higher_better in signals:
        order = F.col(col).desc() if higher_better else F.col(col).asc()
        w = (
            Window.partitionBy(partition_by).orderBy(order)
            if partition_by is not None
            else Window.orderBy(order)
        )
        rc = f"__rk_{col}"
        out = out.withColumn(rc, F.dense_rank().over(w).cast("long"))
        rank_cols.append(rc)
    borda = sum((F.col(rc) for rc in rank_cols), F.lit(0))
    # floor(SCALE / (K + rank)) is exact: an IEEE division of two small
    # integers that divides evenly is exact, and when it doesn't the
    # quotient is nowhere near an integer boundary — no float hazard.
    rrf = sum(
        (
            F.floor(F.lit(RRF_SCALE) / (F.lit(RRF_K) + F.col(rc)))
            for rc in rank_cols
        ),
        F.lit(0),
    )
    return out.withColumn("borda", borda.cast("long")).withColumn(
        "rrf_fp", rrf.cast("long")
    ).drop(*rank_cols)
