"""Count-based language-model scoring for perplexity-style quality
filtering (CCNet / RedPajama lineage): score every document by the
corpus's own add-one-smoothed bigram model.

Scale posture: the model IS two aggregation tables — unigram counts
(vocab-sized) and bigram counts (bigram-vocab-sized) — plus one scalar
(vocab size). Scoring joins each document's bigrams against those
tables on the bigram key: three hash shuffles total, nothing quadratic,
and the count tables are orders of magnitude smaller than a 100 TB
corpus (they broadcast once Zipf has done its work at realistic vocab
sizes; the equi-join form is the safe default).

Determinism contract: probabilities are emitted in FIXED POINT —
``floor(scale * (c12 + 1) / (c1 + V))`` — because every step (int→
double widening, one multiply, one divide, floor) is IEEE-correctly-
rounded and therefore bit-identical in Spark and DuckDB, unlike ``ln``
(libm log differs at the last ulp between engines). Per-document
aggregates are integer sums/mins — order-independent, so no
collect-and-sort is needed. A consumer ranks or thresholds on
``sum_prob_micros / n_bigrams``; the monotone fixed-point surrogate
carries the same ordering as average log-probability would for
filtering purposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_probability_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document add-one-smoothed bigram probability profile:
    (id, n_bigrams, sum_prob_micros, min_prob_micros).

    Documents with fewer than two tokens keep a row with
    ``n_bigrams = 0`` and ``min_prob_micros = -1`` (sentinel; never a
    valid fixed-point probability) so no document silently disappears
    from a quality-filter pipeline.
    """
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__t")
    )
    n = F.size("__t")
    pairs = (
        toks.filter(n >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.slice("__t", 1, n - 1).alias("w1"),
                    F.slice(F.col("__t"), 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    unigrams = toks.select(F.explode("__t").alias("w1"))
    uni_counts = unigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = unigrams.select(
        F.countDistinct("w1").cast("long").alias("__v")
    )
    big_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    scored = (
        pairs.join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.floor(
                F.lit(float(scale))
                * (F.col("c12") + F.lit(1.0))
                / (F.col("c1") + F.col("__v"))
            )
            .cast("long")
            .alias("pm"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("pm").alias("sum_prob_micros"),
        F.min("pm").alias("min_prob_micros"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_prob_micros", F.lit(0))
            .cast("long")
            .alias("sum_prob_micros"),
            F.coalesce("min_prob_micros", F.lit(-1))
            .cast("long")
            .alias("min_prob_micros"),
        )
    )
