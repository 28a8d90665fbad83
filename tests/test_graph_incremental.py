"""`merge_components` (round 12): the incremental merge must equal
batch CC over the union edge set — on chains that span the old/new
boundary, merges of multiple existing components, brand-new nodes,
and the empty-delta no-op."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.graph import (
    connected_components,
)
from data_integration_openfoodfacts_spark.operators.graph_incremental import (
    merge_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _labels_from(spark, pairs, nodes):
    cc = connected_components(_edges(spark, pairs), "u", "v")
    base = spark.createDataFrame([(n,) for n in nodes], "node long")
    return (
        base.join(cc, "node", "left")
        .withColumn("component", F.coalesce("component", F.col("node")))
    )


def _as_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_merge_equals_batch_cc_on_random_graphs(spark):
    rng = random.Random(12)
    for trial in range(3):
        nodes = list(range(30))
        old_pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(15)
        ]
        new_nodes = list(range(30, 40))
        pool = nodes + new_nodes
        new_pairs = [
            (rng.choice(pool), rng.choice(new_nodes)) for _ in range(12)
        ]
        labels = _labels_from(spark, old_pairs, nodes)
        merged = merge_components(labels, _edges(spark, new_pairs))
        batch = _labels_from(
            spark, old_pairs + new_pairs, pool
        )
        got, want = _as_map(merged), _as_map(batch)
        # merged covers old nodes + new-edge nodes; batch covers pool.
        # compare on merged's domain (isolated new nodes are the
        # caller's singleton coalesce, as in q200)
        assert got == {n: want[n] for n in got}, f"trial {trial}"


def test_new_edge_merges_two_existing_components(spark):
    labels = _labels_from(spark, [(1, 2), (5, 6)], [1, 2, 5, 6])
    merged = _as_map(
        merge_components(labels, _edges(spark, [(2, 5)]))
    )
    assert merged == {1: 1, 2: 1, 5: 1, 6: 1}


def test_chain_through_new_nodes_bridges_old_components(spark):
    # 1-2 and 8-9 exist; new chain 2-20, 20-21, 21-8 unifies them
    labels = _labels_from(spark, [(1, 2), (8, 9)], [1, 2, 8, 9])
    merged = _as_map(
        merge_components(
            labels, _edges(spark, [(2, 20), (20, 21), (21, 8)])
        )
    )
    assert set(merged.values()) == {1}
    assert merged[20] == 1 and merged[21] == 1


def test_empty_delta_is_identity(spark):
    labels = _labels_from(spark, [(3, 4)], [3, 4, 7])
    merged = _as_map(
        merge_components(labels, _edges(spark, []))
    )
    assert merged == {3: 3, 4: 3, 7: 7}


def test_untouched_components_keep_labels(spark):
    labels = _labels_from(spark, [(1, 2), (5, 6)], [1, 2, 5, 6])
    merged = _as_map(
        merge_components(labels, _edges(spark, [(6, 30)]))
    )
    assert merged[1] == 1 and merged[2] == 1  # untouched
    assert merged[5] == 5 and merged[6] == 5 and merged[30] == 5
