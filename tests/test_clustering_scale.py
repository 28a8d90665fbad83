"""Warm-start centroid maintenance (`operators/clustering_scale.py`)
— the k∝n SemDeDup fit-amortization path (round 12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.clustering_scale import (
    grow_centroids,
    refine_centroids,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _clustered_rows():
    """Three well-separated direction clusters of 6 vectors each."""
    rows = []
    axes = [(1.0, 0.0, 0.0, 0.0), (0.0, 1.0, 0.0, 0.0), (0.0, 0.0, 1.0, 0.0)]
    i = 0
    for ax in axes:
        for j in range(6):
            v = [a * (1.0 + 0.01 * j) for a in ax]
            v[3] = 0.02 * j  # slight off-axis spread
            rows.append((i, v))
            i += 1
    return rows


def test_grow_preserves_old_and_ids_are_contiguous(spark):
    rows = _clustered_rows()
    emb = _emb(spark, rows)
    old = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[6][1])],
        "centroid_id long, centroid_vec array<float>",
    )
    grown = grow_centroids(emb, old, k_target=5)
    got = {r["centroid_id"]: r["centroid_vec"] for r in grown.collect()}
    assert sorted(got) == [0, 1, 2, 3, 4]
    assert got[0] == rows[0][1] and got[1] == rows[6][1]
    # deterministic: same call -> same seeds
    again = {
        r["centroid_id"]: r["centroid_vec"]
        for r in grow_centroids(emb, old, k_target=5).collect()
    }
    assert got == again


def test_grow_refuses_shrink(spark):
    rows = _clustered_rows()
    old = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[6][1])],
        "centroid_id long, centroid_vec array<float>",
    )
    with pytest.raises(ValueError, match="only grows"):
        grow_centroids(_emb(spark, rows), old, k_target=2)


def test_refine_moves_centers_to_cluster_means(spark):
    """From one seed per true cluster, one sweep lands each center on
    its cluster's member mean (cosine assignment on separable data is
    exact), and the assignment under the refined centers is stable."""
    rows = _clustered_rows()
    emb = _emb(spark, rows)
    seeds = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[6][1]), (2, rows[12][1])],
        "centroid_id long, centroid_vec array<float>",
    )
    refined = refine_centroids(emb, seeds, n_iters=2)
    got = {r["centroid_id"]: r["centroid_vec"] for r in refined.collect()}
    assert sorted(got) == [0, 1, 2]
    import numpy as np

    for cid, members in [(0, rows[:6]), (1, rows[6:12]), (2, rows[12:])]:
        mean = np.mean([m[1] for m in members], axis=0)
        assert np.allclose(got[cid], mean, atol=1e-5)


def test_refine_keeps_empty_cluster_centers(spark):
    rows = _clustered_rows()
    emb = _emb(spark, rows)
    junk = [9.0, -9.0, 9.0, -9.0]  # attracts nothing on cosine axes? it
    # does attract nothing only if a better center exists for every
    # vector: the three axis seeds win every cosine, junk stays empty
    seeds = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[6][1]), (2, rows[12][1]), (3, junk)],
        "centroid_id long, centroid_vec array<float>",
    )
    refined = refine_centroids(emb, seeds, n_iters=1)
    got = {r["centroid_id"]: r["centroid_vec"] for r in refined.collect()}
    assert got[3] == pytest.approx(junk)


def test_refine_validates_iters(spark):
    rows = _clustered_rows()
    seeds = spark.createDataFrame(
        [(0, rows[0][1])], "centroid_id long, centroid_vec array<float>"
    )
    with pytest.raises(ValueError):
        refine_centroids(_emb(spark, rows), seeds, n_iters=0)
