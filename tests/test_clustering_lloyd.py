"""Deterministic integer-quantized Lloyd's KMeans
(operators/clustering.py::fit_centroids_lloyd) — the hash-oracled fit
behind q77. The DuckDB twin lives in plans/llm_queries._lloyd_cents_sql
and is exercised by the oracle gate; these tests pin the operator-level
contract the SQL mirror depends on."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_integration_openfoodfacts_spark.operators.clustering import (
    fit_centroids_lloyd,
)

from tests.conftest import SF_DIR


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_lloyd_deterministic_across_calls(spark):
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    a = fit_centroids_lloyd(emb, k=4, n_iters=2).collect()
    b = fit_centroids_lloyd(emb, k=4, n_iters=2).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 4
    assert {r["centroid_id"] for r in a} == {0, 1, 2, 3}


def test_lloyd_centers_are_exact_micros(spark):
    """Every centroid coordinate is an integer number of micros —
    the property that makes the DuckDB replay bit-exact."""
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = fit_centroids_lloyd(emb, k=4, n_iters=2)
    bad = cents.select(
        F.exists(
            "centroid_vec",
            lambda x: F.abs(x * 1000000.0 - F.round(x * 1000000.0))
            > 1e-9,
        ).alias("frac")
    ).filter("frac").count()
    assert bad == 0


def test_lloyd_two_clear_clusters(spark):
    """Two well-separated blobs -> centers converge to the blob means
    (exact floor-division micros of the quantized members)."""
    rows = [
        (0, [0.10, 0.10]),
        (1, [0.12, 0.10]),
        (2, [0.11, 0.12]),
        (3, [0.90, 0.90]),
        (4, [0.92, 0.90]),
        (5, [0.91, 0.92]),
    ]
    cents = fit_centroids_lloyd(
        _emb(spark, rows), k=2, n_iters=3
    ).collect()
    got = sorted(tuple(r["centroid_vec"]) for r in cents)
    assert got == [(0.11, 0.106666), (0.91, 0.906666)]


def test_lloyd_empty_cluster_keeps_previous_center(spark):
    """k > distinct points: the unowned centroid keeps its (quantized)
    seed vector instead of degenerating to NULL/zero."""
    rows = [(i, [0.5, 0.5]) for i in range(4)]
    cents = fit_centroids_lloyd(
        _emb(spark, rows), k=3, n_iters=2
    ).collect()
    assert len(cents) == 3
    for r in cents:
        assert list(r["centroid_vec"]) == [0.5, 0.5]


def test_lloyd_invariant_to_row_order_and_partitioning(spark):
    """The fit must not depend on physical layout: seeds are chosen by
    (md5, id) — a total order — and means are exact integer floor
    divisions, so shuffling/repartitioning the input cannot move a
    centroid by even one micro."""
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = fit_centroids_lloyd(emb, k=4, n_iters=2).collect()
    scrambled = emb.repartition(7, "label").sortWithinPartitions(
        F.desc("vec_id")
    )
    again = fit_centroids_lloyd(scrambled, k=4, n_iters=2).collect()
    assert [r.asDict() for r in base] == [r.asDict() for r in again]


def test_lloyd_negative_means_floor_not_truncate(spark):
    """Means of negative coordinates use FLOOR division (matches the
    oracle's ((s % n) + n) % n construction): mean of -0.1 and -0.2
    micros sums to -300000/2 = -150000 exactly; an uneven case floors
    toward -inf on both engines."""
    rows = [(0, [-0.1]), (1, [-0.2]), (2, [-0.2000005])]
    cents = fit_centroids_lloyd(
        _emb(spark, rows), k=1, n_iters=1
    ).collect()
    # micros: -100000, -200000, floor(-200000.5+0.5)=-200000 (exact
    # float may dither the last one by 1; recompute expectation here)
    import math

    import numpy as np

    qs = [
        math.floor(float(np.float32(v)) * 1e6 + 0.5)
        for v in (-0.1, -0.2, -0.2000005)
    ]
    s = sum(qs)
    expected = (s - ((s % 3) + 3) % 3) / 3 / 1e6
    assert cents[0]["centroid_vec"][0] == pytest.approx(
        expected, abs=0
    )
