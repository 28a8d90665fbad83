"""Distributed quality-classifier TRAINING — the learn half of the
DCLM/fastText-style filtering loop whose inference half is
``operators/quality_classifier.py`` (q134): a hashed bag-of-words
linear classifier fit with full-batch gradient descent, deterministic
enough that DuckDB replays the exact same unrolled iterations
(round-9 VERDICT #6 — the last LLM-pipeline family where the engine
only did half the story).

Determinism design (the q77/q104 unrolled-iteration pattern):

- weights are integer MICRO-units seeded from md5 (engine-portable
  init, no RNG state);
- the per-doc margin is ``FLOOR(SUM(w*x) / n_tokens)`` and the
  activation is a HARD sigmoid ``clamp(500000 + FLOOR(m/4), 0, 1e6)``
  — integer arithmetic end to end, so no transcendental (exp) has to
  agree bit-for-bit across engines DURING training (errors would
  compound across iterations; the smooth sigmoid stays where it
  always was — the final inference score, q134);
- every FLOOR is over an IEEE double division whose numerator is
  bounded far below 2^53 (|w| clamped to 1e6, e in [-1e6, 1e6], so
  SUM(w*x) <= 1e6 * n_tokens and SUM(e*x) <= 1e6 * total_tokens) —
  the same portable-division convention as PageRank (q104);
- the weight update runs DRIVER-side on the k-row gradient envelope
  with ``math.floor(g / d)`` — float division + floor, bit-identical
  to both engines' ``FLOOR(g / d)``.

Scale shape: one O(total tokens) feature build (one shuffle to
(doc, bucket) counts), then per iteration: broadcast the
``num_buckets``-row weight table into the checkpointed feature frame,
one groupBy(doc) for margins, one join back on doc_id, one
groupBy(bucket) whose output is the BOUNDED gradient envelope
(num_buckets rows — the k x d driver-collect convention, same as
KMeans centroids). Nothing O(corpus) ever reaches the driver and no
iteration rescans text.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.localframe import local_rows_df

from .similarity_dedup import md5_long

WEIGHT_CLAMP = 1_000_000


def init_weights_rows(
    num_buckets: int, tag: str = "qtrain"
) -> list[tuple[int, int]]:
    """md5-seeded integer micro-weights in [-1000, 1000] — the same
    construction as ``quality_classifier.synthetic_weights`` (which
    is milli-units for inference), evaluated driver-side so the
    training loop starts from plain Python ints. Deterministic and
    replayable in SQL: ``md5_long(tag || bucket) % 2001 - 1000``."""
    import hashlib

    rows = []
    for b in range(num_buckets):
        h = hashlib.md5(f"{tag}{b}".encode()).hexdigest()
        v = int(h[:15], 16) % 2001 - 1000
        rows.append((b, v))
    return rows


def doc_bucket_features(
    docs: DataFrame,
    num_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
) -> DataFrame:
    """(id, bucket, x, n_tokens, y): hashed token counts per document
    with the doc's token total and 0/1 label attached to every row —
    the one frame the training loop iterates over (callers checkpoint
    it; n_tokens/y ride along so no per-iteration re-join with a doc
    table is needed). Same md5 token hashing as the inference side
    (``quality_classifier.hashed_linear_score``), so trained weights
    plug straight into q134's scoring join."""
    toks = docs.select(
        F.col(id_col),
        F.col(label_col).cast("long").alias("y"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    feats = toks.groupBy(
        id_col,
        "y",
        F.pmod(md5_long(F.col("tok")), F.lit(num_buckets)).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("x"))
    ntok = feats.groupBy(id_col).agg(F.sum("x").alias("n_tokens"))
    return feats.join(ntok, id_col).select(
        id_col, "bucket", "x", "n_tokens", "y"
    )


def train_hashed_logistic(
    docs: DataFrame,
    num_buckets: int = 64,
    n_iters: int = 3,
    lr_inv: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "y",
    init_tag: str = "qtrain",
) -> DataFrame:
    """Fit the hashed linear classifier on labeled documents
    (``label_col`` 0/1) and return the learned ``(bucket, w_micro)``
    table — all ``num_buckets`` rows, integer micro-weights.

    Full-batch synchronous GD (NOT per-sample SGD: sample order is
    not reproducible across engines; the full-batch gradient is a
    set aggregate). Per iteration, with integer x and micro-unit w:

    - margin   ``m_d = FLOOR(SUM_b(w_b * x_db) / n_tokens_d)``
    - activation ``p_d = clamp(500000 + FLOOR(m_d / 4), 0, 1e6)``
      (hard sigmoid in micros; slope 1/4 at the origin like the
      smooth one)
    - error    ``e_d = y_d * 1e6 - p_d``
    - gradient ``g_b = SUM_d(e_d * x_db)``
    - update   ``w_b += FLOOR(g_b / (n_docs * lr_inv))``, clamped to
      ±1e6.

    The gradient table is ``num_buckets`` rows — collected per
    iteration as the bounded driver envelope (k x d convention) and
    updated with ``math.floor`` (bit-identical to SQL FLOOR over the
    same double division), which also cuts iterative lineage at zero
    checkpoint cost.
    """
    spark = docs.sparkSession
    feats = doc_bucket_features(
        docs, num_buckets, id_col, text_col, label_col
    ).localCheckpoint(eager=True)
    n_docs = feats.select(id_col).distinct().count()
    w = dict(init_weights_rows(num_buckets, init_tag))
    if n_docs == 0:
        return local_rows_df(
            spark, sorted(w.items()), "bucket long, w_micro long"
        )
    for _ in range(n_iters):
        wdf = local_rows_df(
            spark, sorted(w.items()), "bucket long, w_micro long"
        )
        margins = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col)
            .agg(
                F.floor(
                    F.sum(F.col("w_micro") * F.col("x"))
                    / F.first("n_tokens")
                ).alias("m"),
                F.first("y").alias("y"),
            )
        )
        p = F.least(
            F.lit(1_000_000),
            F.greatest(F.lit(0), F.lit(500_000) + F.floor(F.col("m") / 4)),
        )
        err = margins.select(
            id_col, (F.col("y") * F.lit(1_000_000) - p).alias("e")
        )
        grad = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("e") * F.col("x")).alias("g"))
        )
        # bounded driver envelope: num_buckets rows
        g = {r["bucket"]: r["g"] for r in grad.collect()}
        d = n_docs * lr_inv
        w = {
            b: max(
                -WEIGHT_CLAMP,
                min(WEIGHT_CLAMP, wv + math.floor(g.get(b, 0) / d)),
            )
            for b, wv in w.items()
        }
    return local_rows_df(
        spark, sorted(w.items()), "bucket long, w_micro long"
    )


def trained_weights_for_inference(weights_micro: DataFrame) -> DataFrame:
    """Adapt the trained micro-weight table to the inference side's
    milli-weight contract (``hashed_linear_score`` expects
    (bucket, w_milli)): FLOOR(w_micro / 1000) — integer, portable."""
    return weights_micro.select(
        "bucket",
        F.floor(F.col("w_micro") / 1000).cast("long").alias("w_milli"),
    )
