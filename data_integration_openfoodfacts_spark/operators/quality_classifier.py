"""Classifier-based quality filtering: fastText-style linear scorer
INFERENCE over a document corpus — the model-based filter stage of
modern LLM data pipelines (DCLM, FineWeb-Edu style: a cheap linear
classifier scores every crawled document; only high-scoring docs enter
the training mix).

Spark-first shape: tokenize (split — same convention as the rest of
the text stack), hash each token into one of ``num_buckets`` feature
buckets (md5-derived, engine-portable), broadcast-join the (tiny)
weight table, one map-side-combined groupBy per document, sigmoid.
Work is O(total tokens); the weight table is ``num_buckets`` rows and
always broadcasts. No Python in the path — pure JVM expressions.

Cross-engine exactness: weights are integer MILLI-weights, so the
per-document accumulation is an exact integer sum (order-independent —
the decimal/integer-sum determinism rule, see plans/analytics.py);
only the final sigmoid touches doubles, in a fixed operation order
both engines replay bit-identically.

Production swap-in: ``synthetic_weights`` is the deterministic test
harness (hash-derived weights, reproducible in the DuckDB oracle). A
real deployment loads its trained weights parquet as the same
(bucket, w_milli) shape — train offline (fastText/sklearn), quantize
to millis, ship the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity_dedup import md5_long


def synthetic_weights(
    spark: SparkSession, num_buckets: int = 4096, tag: str = "qw"
) -> DataFrame:
    """Deterministic (bucket, w_milli) weight table: w_milli =
    md5_long(tag || bucket) % 2001 - 1000, i.e. integer millis in
    [-1000, 1000]. Same construction as the oracle's SQL twin."""
    return spark.range(num_buckets).select(
        F.col("id").alias("bucket"),
        (
            F.pmod(
                md5_long(F.concat(F.lit(tag), F.col("id").cast("string"))),
                F.lit(2001),
            )
            - 1000
        ).cast("long").alias("w_milli"),
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    num_buckets: int = 4096,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with a hashed bag-of-words linear model:
    score = sigmoid(mean over tokens of w[md5(token) % num_buckets]).

    Returns (id_col, n_tokens, score, keep) — ``keep`` is the filter
    decision at ``threshold``. ``weights`` must be (bucket, w_milli)
    with w_milli integer milli-weights (see module docstring).

    Scale: explode to tokens (narrow), broadcast-join the weight table
    (num_buckets rows — small by construction), ONE shuffle on
    ``id_col`` with map-side partial sums of exact integers. At 100 TB
    this is the same cost envelope as a token count.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    feats = toks.select(
        F.col(id_col),
        F.pmod(md5_long(F.col("tok")), F.lit(num_buckets)).alias("bucket"),
    )
    # LEFT join + coalesce(w_milli, 0): a production weight table may
    # be SPARSE (zero-weight buckets omitted after training); an inner
    # join would silently drop those tokens from n_tokens and emit no
    # row at all for a document whose tokens all miss the table. The
    # dense synthetic table is unaffected (every bucket present).
    agg = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("w_milli"), F.lit(0))).alias("s"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    # fixed double op order: (s as double) / (n as double * 1000.0)
    mean = F.col("s").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1000.0)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
    return agg.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        (score >= F.lit(threshold)).alias("keep"),
    )


def quality_bucket_sample(
    scored: DataFrame,
    rates_permille: list[int],
    lo: float = 0.4,
    hi: float = 0.6,
    id_col: str = "doc_id",
    score_col: str = "score",
    salt: str = "qmix",
) -> DataFrame:
    """Quality-curriculum sampling (FineWeb/DCLM mixing shape): bucket
    documents by classifier score into ``len(rates_permille)`` equal
    score bands over [lo, hi) (clamped at the ends), then keep each
    document with its band's deterministic per-mille rate — higher
    bands keep more, so the output corpus is tilted toward quality
    without discarding the tail outright.

    Bucketing is FIXED-THRESHOLD (a narrow per-row expression), not
    ntile: a global rank window would single-partition the corpus —
    the exact antipattern the plan-shape suite bans. Sampling is the
    md5-bucket Bernoulli used across the engine (deterministic,
    partition-layout independent, engine-portable).

    Returns (id_col, bucket, score_col, kept) for every input doc —
    callers filter ``kept`` for the mix; keeping the decision column
    makes the selection auditable (and oracle-checkable) per band.
    """
    k = len(rates_permille)
    # band = clamp(floor((score - lo) / (hi - lo) * k), 0, k-1).
    # The divisor is the COLUMN expression lit(hi) - lit(lo), never the
    # Python value hi - lo: the oracle's SQL twin writes (0.6 - 0.4),
    # and 0.6 - 0.4 = 0.19999999999999996 != the literal 0.2 — both
    # engines must perform the same subtraction on the same doubles or
    # boundary scores floor into different bands (cross-engine
    # determinism rule, plans/analytics.py).
    raw = F.floor(
        (F.col(score_col) - F.lit(lo))
        / (F.lit(hi) - F.lit(lo))
        * F.lit(float(k))
    ).cast("long")
    bucket = F.greatest(F.lit(0), F.least(F.lit(k - 1), raw))
    rate = F.element_at(
        F.array(*[F.lit(r).cast("long") for r in rates_permille]),
        (bucket + 1).cast("int"),
    )
    draw = F.pmod(
        md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(1000),
    )
    return scored.select(
        id_col,
        bucket.alias("bucket"),
        score_col,
        (draw < rate).alias("kept"),
    )
