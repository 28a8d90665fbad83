"""Collision star edges (`operators/collision_edges.py`) — the q202
ingest→clustering bridge (round 13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.collision_edges import (
    collision_star_edges,
)


def _bands(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, band long, sig string"
    )


def test_star_edges_connect_exactly_the_collision_graph(spark):
    """Per (band, sig) group: each batch doc links to the min ledger
    doc and the min earlier batch doc — and running CC over the stars
    equals CC over ALL colliding pairs."""
    ledger = _bands(
        spark,
        [(5, 0, "a"), (9, 0, "a"), (7, 1, "z"), (3, 2, "only_ledger")],
    )
    batch = _bands(
        spark,
        [
            (20, 0, "a"),   # collides with ledger {5, 9} -> edge to 5
            (21, 0, "a"),   # same group -> edges to 5 and to 20
            (22, 3, "new"),  # batch-only group with 23
            (23, 3, "new"),
            (24, 4, "solo"),  # no collision at all
        ],
    )
    got = {
        (r["u"], r["v"])
        for r in collision_star_edges(batch, ledger).collect()
    }
    assert got == {(20, 5), (21, 5), (21, 20), (23, 22)}


def test_sentinel_rows_never_collide(spark):
    """The ingest heal's (band=-1, sig='') sentinels must not create
    edges between unrelated unshingleable docs."""
    ledger = _bands(spark, [(5, -1, ""), (6, -1, "")])
    batch = _bands(spark, [(20, 0, "x"), (21, 5, "y")])
    assert collision_star_edges(batch, ledger).count() == 0


def test_hot_group_stays_linear(spark):
    """A degenerate (band, sig) bucket with m batch docs emits O(m)
    star edges, not m^2/2 pairs (the q151 invariant, cross-tranche)."""
    ledger = _bands(spark, [(i, 0, "hot") for i in range(3)])
    batch = _bands(spark, [(100 + i, 0, "hot") for i in range(50)])
    edges = collision_star_edges(batch, ledger).collect()
    # 50 edges to ledger-min 0 + 49 intra-batch edges to 100
    assert len(edges) == 99
    assert {r["v"] for r in edges} == {0, 100}


def test_ledger_is_probed_not_broadcast(spark, tmp_path):
    """Plan pin: the ledger side appears as a scan under a broadcast
    LEFT-SEMI of the batch's (band, sig) keys — the ledger itself is
    never the broadcast build side (the round-8 TRANCHE rule)."""
    path = str(tmp_path / "bands.parquet")
    _bands(
        spark, [(i, i % 4, f"s{i % 7}") for i in range(200)]
    ).write.parquet(path)
    ledger = spark.read.parquet(path)
    batch = _bands(spark, [(900, 0, "s0"), (901, 1, "s1")])
    plan = (
        collision_star_edges(batch, ledger)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    # the only broadcasts are batch-derived frames; the parquet ledger
    # scan feeds a semi probe and a bounded min-aggregation
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan