"""Deterministic sampling and sharding for training-data pipelines.

``df.sample()`` draws from a partition-seeded RNG: the selected set
changes whenever the partition layout does (repartition, AQE, file
split sizing), which makes experiment reruns and audit trails
impossible at 100 TB. Every operator here instead derives its decision
from the md5 of a stable row id — a narrow per-row expression with NO
shuffle and NO RNG state, so the same row is selected on a laptop, a
1000-executor cluster, and in the DuckDB oracle (bit-identical).

Scale notes:
- ``deterministic_sample`` / ``assign_shards`` are pure row-local
  projections/filters — they pipeline into the surrounding stage and
  cost one md5 per row.
- ``stratified_sample_exact`` needs a per-stratum top-k, which is one
  hash shuffle on the strata columns; rank ties are impossible because
  the sort key includes the unique id. Skewed strata parallelize like
  any window (single reducer per stratum) — for pathological strata
  use ``deterministic_sample`` per-stratum rates instead.

Reference scope: the reference pipeline has no sampling surface (its
notebook processes the full 418k extract); these operators extend the
engine for LLM-corpus curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localframe import local_rows_df

from .similarity_dedup import md5_long

# Sampling decisions quantize the hash into this many buckets; rates
# are exact multiples of 1/RATE_DENOM (1e-6 resolution).
RATE_DENOM = 1_000_000


def sample_bucket(id_col: str, salt: str = "") -> F.Column:
    """Stable bucket in [0, RATE_DENOM) from md5(salt || id).

    DuckDB twin: CAST(concat('0x', substring(md5(salt || CAST(id AS
    VARCHAR)), 1, 15)) AS BIGINT) % 1000000."""
    return md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % RATE_DENOM


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff its id hashes below ``rate`` — a Bernoulli
    sample that is re-run-stable and partition-layout independent.

    The filter is a narrow expression (no shuffle); at 100 TB it rides
    the scan stage and costs one md5 per row.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = round(rate * RATE_DENOM)
    return df.where(sample_bucket(id_col, salt) < threshold)


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum, chosen by hash
    order — deterministic equivalent of per-group reservoir sampling.

    One shuffle on ``strata_cols``; the (hash, id) sort key is unique,
    so the selected set is total-order stable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_bucket(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Add a stable ``shard`` column in [0, n_shards) — the writer-side
    primitive for balanced training shards.

    md5 is uniform, so shard sizes concentrate tightly around n/k
    (the per-shard count is Binomial(n, 1/k)); downstream writers
    ``repartition("shard")`` to get one output group per shard without
    a global sort.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return df.withColumn(
        "shard",
        (
            md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
            % n_shards
        ).cast("int"),
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k):
    Efraimidis-Spirakis A-ES with the randomness derived from md5 —
    each row gets key ln(u)/w for u = (bucket+1)/RATE_DENOM in (0, 1],
    and the k LARGEST keys win (equivalent to ranking by u^(1/w);
    heavier rows draw keys nearer 0, lighter rows more negative).

    Inclusion probabilities match true weighted sampling without
    replacement, but the draw is a pure function of (salt, id, weight):
    re-run-stable, partition-layout independent, and reproducible in
    any engine with md5 + ln. Rows with NULL or non-positive weights
    are EXCLUDED (a negative weight would flip ln(u)'s sign and
    deterministically outrank every valid row; zero divides to NULL) —
    sampling semantics are only defined for w > 0.

    Scale: the key is a narrow per-row expression; selection is a
    global top-k (TakeOrderedAndProject — per-partition heaps, no full
    sort). The id tiebreaker makes the selected set total-order stable
    even under md5 bucket collisions.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (sample_bucket(id_col, salt) + 1).cast("double") / float(RATE_DENOM)
    key = F.when(F.col(weight_col) > 0, F.log(u) / F.col(weight_col))
    return (
        df.withColumn("sample_key", key)
        .filter(F.col("sample_key").isNotNull())
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    targets: dict[str, float],
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Data-mixture balancing: deterministically subsample each group to
    its target share of an overall ``budget`` — the operator that turns
    a raw crawl into a training mixture ("50% web, 30% books, 20%
    code"). Per group the Bernoulli rate is
    ``min(1, target * budget / group_count)`` (a group smaller than its
    allocation is kept whole — under-representation is surfaced by the
    output counts, not silently rebalanced), and membership is the
    md5-bucket draw of ``deterministic_sample``: re-run-stable,
    layout-independent, engine-reproducible. Groups absent from
    ``targets`` are dropped.

    Scale: one tiny groupBy-count (broadcast back), then a narrow
    per-row filter — no extra shuffle of the data itself. Expected
    sample size per group is rate*count ~ target*budget; exact-count
    quotas need ``stratified_sample_exact`` instead.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    spark = df.sparkSession
    tgt = local_rows_df(
        spark,
        [(g, float(t)) for g, t in sorted(targets.items())],
        f"{group_col} string, __target double",
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    rates = counts.join(tgt, group_col).select(
        group_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.col("__target") * budget / F.col("__cnt"),
            )
            * RATE_DENOM
        ).alias("__threshold"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(sample_bucket(id_col, salt) < F.col("__threshold"))
        .drop("__threshold")
    )
