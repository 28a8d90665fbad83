"""Distributed quality-classifier training (`operators/training.py`,
round-9 VERDICT #6): planted-separable learning that BEATS the
synthetic weights through the unchanged q134 inference join,
determinism of the trajectory, and the integer-arithmetic invariants
the DuckDB oracle relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from data_integration_openfoodfacts_spark.operators.training import (
    WEIGHT_CLAMP,
    init_weights_rows,
    train_hashed_logistic,
    trained_weights_for_inference,
)

N_BUCKETS = 64


def _planted(spark, n_per_class=20):
    """Separable corpus: class-1 docs repeat 'excellent' tokens,
    class-0 docs repeat 'terrible' tokens, shared filler elsewhere."""
    rows = []
    for i in range(n_per_class):
        rows.append(
            (i, f"excellent prose excellent clarity filler{i % 5} common", 1)
        )
        rows.append(
            (
                1000 + i,
                f"terrible spam terrible noise filler{i % 5} common",
                0,
            )
        )
    return spark.createDataFrame(rows, "doc_id long, text string, y long")


def test_trained_weights_beat_synthetic(spark):
    """On the planted corpus the trained filter separates the classes
    through q134's UNCHANGED inference operator, while the synthetic
    (hash-noise) weights cannot: trained accuracy is perfect, and
    strictly above synthetic's."""
    docs = _planted(spark)
    w = trained_weights_for_inference(
        train_hashed_logistic(docs, num_buckets=N_BUCKETS, n_iters=5)
    )

    def accuracy(weights):
        scored = hashed_linear_score(
            docs, weights, num_buckets=N_BUCKETS, threshold=0.5
        )
        hits = (
            docs.select("doc_id", "y")
            .join(scored.select("doc_id", "keep"), "doc_id")
            .filter(F.col("keep").cast("long") == F.col("y"))
            .count()
        )
        return hits / docs.count()

    acc_trained = accuracy(w)
    acc_synth = accuracy(synthetic_weights(spark, N_BUCKETS))
    assert acc_trained == 1.0, acc_trained
    assert acc_trained > acc_synth, (acc_trained, acc_synth)


def test_training_is_deterministic(spark):
    """Two independent fits produce the identical weight table — no
    RNG, no partition-order dependence (full-batch integer GD)."""
    docs = _planted(spark, n_per_class=8)
    a = sorted(
        tuple(r)
        for r in train_hashed_logistic(
            docs, num_buckets=N_BUCKETS, n_iters=3
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in train_hashed_logistic(
            docs.repartition(7), num_buckets=N_BUCKETS, n_iters=3
        ).collect()
    )
    assert a == b


def test_weight_table_shape_and_clamp(spark):
    """All num_buckets rows present (untouched buckets keep their
    md5-seeded init) and every weight inside the ±clamp that keeps the
    FLOOR numerators sub-2^53 (the cross-engine division contract)."""
    docs = _planted(spark, n_per_class=4)
    w = train_hashed_logistic(docs, num_buckets=N_BUCKETS, n_iters=3)
    rows = {r["bucket"]: r["w_micro"] for r in w.collect()}
    assert sorted(rows) == list(range(N_BUCKETS))
    assert all(abs(v) <= WEIGHT_CLAMP for v in rows.values())
    # a bucket no planted token hashes into keeps its exact init value
    init = dict(init_weights_rows(N_BUCKETS))
    feats_buckets = {
        r["bucket"]
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        .select(
            F.pmod(
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast(
                    "long"
                ),
                F.lit(N_BUCKETS),
            ).alias("bucket")
        )
        .distinct()
        .collect()
    }
    untouched = set(range(N_BUCKETS)) - feats_buckets
    assert untouched, "planted corpus unexpectedly covers every bucket"
    for b in untouched:
        assert rows[b] == init[b]


def test_empty_and_single_class_inputs(spark):
    """Zero labeled docs returns the pure init table; an all-positive
    corpus pushes its touched weights upward (gradient sign sanity)."""
    empty = spark.createDataFrame([], "doc_id long, text string, y long")
    w0 = train_hashed_logistic(empty, num_buckets=8, n_iters=2)
    assert {tuple(r) for r in w0.collect()} == set(
        init_weights_rows(8)
    )
    pos = spark.createDataFrame(
        [(1, "alpha beta gamma", 1), (2, "alpha beta delta", 1)],
        "doc_id long, text string, y long",
    )
    init = dict(init_weights_rows(8))
    w = {
        r["bucket"]: r["w_micro"]
        for r in train_hashed_logistic(
            pos, num_buckets=8, n_iters=3, lr_inv=1
        ).collect()
    }
    moved = {b for b in w if w[b] != init[b]}
    assert moved and all(w[b] > init[b] for b in moved)
