"""Label propagation (`operators/propagation.py`, round 10): clamped
seeds, hop-bounded reach, floor-mean determinism, isolated-node prior."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.propagation import (
    PRIOR_MICROS,
    propagate_labels,
)


def _run(spark, edges, seeds, n_iters=2):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    s = spark.createDataFrame(seeds, "node long, label_micros long")
    out = propagate_labels(e, s, n_iters=n_iters)
    return {r["node"]: (r["label_micros"], r["is_seed"]) for r in out.collect()}


def test_chain_reach_is_hop_bounded_and_seeds_clamped(spark):
    """Seed 1 (label 1.0) on a 1-2-3-4 chain, 2 iterations: node 2
    converges toward the seed, node 3 gets partial mass, node 4 (3
    hops out) has moved off the prior only via round-2's use of node
    3's round-1 value — and the seed itself never moves even though
    its neighbour disagrees."""
    got = _run(spark, [(1, 2), (2, 3), (3, 4)],
               [(1, 1_000_000)], n_iters=2)
    assert got[1] == (1_000_000, True)
    # round 1: n2 = (1e6 + 5e5)//2 = 750000; n3 = (5e5+5e5)//2 = 500000
    # round 2: n2 = (1e6 + 5e5)//2 = 750000; n3 = (75e4+5e5)//2 = 625000
    #          n4 = n3_round1 = 500000
    assert got[2] == (750_000, False)
    assert got[3] == (625_000, False)
    assert got[4] == (500_000, False)


def test_isolated_seed_and_disconnected_node(spark):
    """A seed with no edges keeps its label and appears in the output;
    a non-seed island keeps the prior."""
    got = _run(spark, [(10, 11)], [(99, 250_000)])
    assert got[99] == (250_000, True)
    assert got[10] == (PRIOR_MICROS, False)
    assert got[11] == (PRIOR_MICROS, False)


def test_two_seed_tug_of_war_floor_mean(spark):
    """A node between a 0-label and a 1e6-label seed lands exactly on
    the floor mean — the integer arithmetic every engine reproduces."""
    got = _run(spark, [(1, 2), (2, 3)],
               [(1, 0), (3, 1_000_001)], n_iters=1)
    assert got[2] == ((0 + 1_000_001) // 2, False)


def test_deterministic_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(30)] + [(5, 25), (7, 19)]
    seeds = [(0, 1_000_000), (29, 0)]
    a = _run(spark, edges, seeds)
    e = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    s = spark.createDataFrame(seeds, "node long, label_micros long")
    b = {
        r["node"]: (r["label_micros"], r["is_seed"])
        for r in propagate_labels(e, s, n_iters=2).collect()
    }
    assert a == b


def test_plan_no_python_no_cartesian(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    s = spark.createDataFrame([(1, 1_000_000)], "node long, label_micros long")
    plan = (
        propagate_labels(e, s, n_iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_tf_weighted_simhash_separates_repetition(spark):
    """The weighted fingerprint's reason to exist: token-set-equal
    documents with different repetition profiles fingerprint apart
    when a dominant token flips contested bits, while exact duplicates
    collide; and the weighted hash of a tf=1 document equals q20's
    unweighted hash (weights degenerate to the unweighted vote)."""
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        simhash,
    )
    from data_integration_openfoodfacts_spark.operators.weighted_fingerprint import (
        tf_weighted_simhash,
    )

    rows = [
        (1, "spam spam spam spam spam ham eggs"),
        (2, "spam ham eggs"),               # same token SET as 1
        (3, "spam spam spam spam spam ham eggs"),  # exact dup of 1
        (4, "alpha beta gamma"),             # all tf=1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = {r["doc_id"]: r["simhash"] for r in
         tf_weighted_simhash(df, "doc_id", "text").collect()}
    u = {r["doc_id"]: r["simhash"] for r in
         simhash(df, "doc_id", "text").collect()}
    assert w[1] == w[3]                      # exact dup collides
    assert u[1] == u[2]                      # unweighted can't see tf
    assert w[1] != w[2]                      # weighted can
    assert w[4] == u[4]                      # tf=1 degenerates to q20
