"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): select pretraining
documents whose hashed-n-gram distribution looks like a TARGET domain,
by weighting each document with the likelihood ratio of its bigrams
under target vs raw bucket models.

Spark-first shape: one explode to hashed bigram buckets (narrow), ONE
conditional aggregation produces BOTH bucket models (target and raw
counts per bucket — never two corpus passes), the ``num_buckets``-row
ratio table broadcasts back onto the bigram stream, and one groupBy per
document sums integer micro-ratios. Work is O(total bigrams) with two
key shuffles (bucket, doc) — the same envelope as a token count, at any
corpus size; the model tables are ``num_buckets`` rows by construction.

Determinism contract (the lm_scoring.py rule): DSIR's log-likelihood
ratio is replaced by the FIXED-POINT per-bigram likelihood ratio
``floor(scale * (ct+1) * (R+B) / ((cr+1) * (T+B)))`` — int→double
widening, two multiplies, one divide, floor, each IEEE-correctly-
rounded and bit-identical across engines, where ``ln`` is not (libm
last-ulp drift). Summing per-bigram fixed-point ratios instead of log
ratios changes the statistic (arithmetic instead of geometric mean) but
preserves the selection semantics — monotone in "looks like the
target" — and makes the whole output integer/boolean hash-exact.
Resampling is the engine's standard deterministic md5 per-mille
Bernoulli, stratified by fixed importance bands (no global sort, no
ntile window).

Reference scope note: the OpenFoodFacts reference has no corpus
operators; this extends the engine's LLM-pipeline surface
(BASELINE.json extensions), next to the quality classifier
(quality_classifier.py) and the CCNet-style LM scorer (lm_scoring.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import md5_long


def hashed_ngram_importance(
    docs: DataFrame,
    is_target: Column,
    num_buckets: int = 4096,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_thresholds: tuple[int, ...] = (500_000, 1_000_000, 2_000_000),
    rates_permille: tuple[int, ...] = (100, 300, 600, 900),
    salt: str = "dsir",
) -> DataFrame:
    """Score and resample every document by hashed-bigram importance.

    ``is_target`` is a boolean Column over ``docs`` marking the target
    domain sample (DSIR's in-domain corpus); the complement is the raw
    pool. Both models come from the SAME input frame — a production run
    that keeps target and raw in separate tables unions them with a
    literal flag first.

    Returns one row per input document (documents with < 2 tokens get
    zeros — nothing silently disappears from a selection pipeline):
    (id_col, n_bigrams, score_micros, avg_lr_micros, band, selected).
    ``avg_lr_micros`` ~ ``scale`` means "bigram mix indistinguishable
    from the raw pool"; larger means target-like. ``selected`` keeps
    each band at its deterministic per-mille rate, tilted toward
    target-like bands.
    """
    if len(rates_permille) != len(band_thresholds) + 1:
        raise ValueError("need one rate per band (len(thresholds) + 1)")
    toks = docs.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.split(F.col(text_col), " ").alias("__w"),
    )
    n = F.size("__w")
    pairs = (
        toks.filter(n >= 2)
        .select(
            id_col,
            "__t",
            F.explode(
                F.arrays_zip(
                    F.slice("__w", 1, n - 1).alias("w1"),
                    F.slice(F.col("__w"), 2, n - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(
            id_col,
            "__t",
            F.pmod(
                md5_long(
                    F.concat(F.col("bg.w1"), F.lit(" "), F.col("bg.w2"))
                ),
                F.lit(num_buckets),
            ).alias("bucket"),
        )
    )
    # both bucket models in ONE aggregation pass
    counts = pairs.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0))
        .cast("long")
        .alias("ct"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1))
        .cast("long")
        .alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("long").alias("__T"),
        F.sum("cr").cast("long").alias("__R"),
    )
    b = float(num_buckets)
    # fixed op order, mirrored verbatim in the SQL twin:
    # scale * (ct+1.0) * (R+B) / ((cr+1.0) * (T+B))
    lr = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.lit(float(scale))
                * (F.col("ct") + F.lit(1.0))
                * (F.col("__R") + F.lit(b))
                / ((F.col("cr") + F.lit(1.0)) * (F.col("__T") + F.lit(b)))
            ).alias("lr_micros"),
        )
    )
    scored = (
        pairs.select(id_col, "bucket")
        .join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lr_micros").alias("score_micros"),
        )
    )
    out = (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("score_micros", F.lit(0)).alias("score_micros"),
        )
        .withColumn(
            "avg_lr_micros",
            F.when(
                F.col("n_bigrams") > 0,
                F.expr("score_micros DIV n_bigrams"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    band = F.lit(len(band_thresholds))
    for i, th in reversed(list(enumerate(band_thresholds))):
        band = F.when(F.col("avg_lr_micros") < th, F.lit(i)).otherwise(band)
    out = out.withColumn("band", band)
    rate = F.element_at(
        F.array(*[F.lit(r) for r in rates_permille]),
        F.col("band").cast("int") + 1,
    )
    return out.withColumn(
        "selected",
        F.pmod(
            md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.lit(1000),
        )
        < rate,
    )
