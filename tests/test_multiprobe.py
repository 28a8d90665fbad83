"""Multi-probe LSH (`operators/multiprobe.py`): superset-of-single-
probe property, n_flips=0 degeneracy, measured recall improvement
against exact ground truth on real test vectors, and argument
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.multiprobe import (
    multiprobe_align,
    multiprobe_lsh_cross_candidates,
)
from data_integration_openfoodfacts_spark.sources.parquet_source import (
    load_table,
)

SF = "/root/testdata/sf0.001"
DIM = 64


def _split(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = emb.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    return q, c


def _pairs(df, a="q_id", b="c_id"):
    return {(r[a], r[b]) for r in df.collect()}


def test_multiprobe_is_superset_of_single(spark):
    q, c = _split(spark)
    single = _pairs(
        multiprobe_lsh_cross_candidates(
            q, c, DIM, rows_per_band=8, num_bands=4, n_flips=0
        )
    )
    multi = _pairs(
        multiprobe_lsh_cross_candidates(
            q, c, DIM, rows_per_band=8, num_bands=4
        )
    )
    assert single <= multi
    assert len(multi) > len(single)


def test_recall_improves_against_exact_truth(spark):
    """Ground truth: exact cosine >= t cross pairs. Multi-probe must
    recover strictly more of them than single-probe at a banding
    selective enough that single-probe misses some."""
    from data_integration_openfoodfacts_spark.functions.vectors import (
        pair_dot_fold,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        dot_product_expr,
    )

    q, c = _split(spark)
    t = 0.25
    ea = q.select(
        "q_id", F.col("embedding").alias("__va"),
        F.sqrt(dot_product_expr("embedding", "embedding")).alias("__na"),
    )
    eb = c.select(
        "c_id", F.col("embedding").alias("__vb"),
        F.sqrt(dot_product_expr("embedding", "embedding")).alias("__nb"),
    )
    truth = _pairs(
        ea.crossJoin(eb)
        .select(
            "q_id", "c_id",
            F.try_divide(
                pair_dot_fold("__va", "__vb"),
                F.col("__na") * F.col("__nb"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= t)
    )
    assert truth, "fixture must contain true pairs"
    single = truth & _pairs(
        multiprobe_align(
            q, c, DIM, t, rows_per_band=8, num_bands=4, n_flips=0
        )
    )
    multi = truth & _pairs(
        multiprobe_align(q, c, DIM, t, rows_per_band=8, num_bands=4)
    )
    assert single <= multi and len(multi) > len(single)
    # verified output never contains below-threshold pairs
    assert multi <= truth


def test_verified_pairs_are_exact_subset_of_candidates(spark):
    q, c = _split(spark)
    cand = _pairs(
        multiprobe_lsh_cross_candidates(
            q, c, DIM, rows_per_band=8, num_bands=4
        )
    )
    verified = _pairs(
        multiprobe_align(q, c, DIM, 0.25, rows_per_band=8, num_bands=4)
    )
    assert verified <= cand


def test_flip_bounds_validated(spark):
    q, c = _split(spark)
    with pytest.raises(ValueError, match="n_flips"):
        multiprobe_lsh_cross_candidates(
            q, c, DIM, rows_per_band=8, num_bands=4, n_flips=9
        )
