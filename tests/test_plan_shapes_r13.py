"""Plan-shape pins for the round-13 surface: merge_components'
endpoint translation no longer shuffles the label ledger (VERDICT r12
#2 — the in-memory variant now matches the persisted ledger's
bucket-pruned probe shape), and the coarse-quantizer assignment stays
Arrow-only like `gemm_assign`."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffle_count(plan: str) -> int:
    """Shuffle exchanges only — BroadcastExchange of a delta-bounded
    frame is the SHAPE these pins demand, not a violation."""
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def _labels_parquet(spark, tmp_path):
    """A parquet-backed (node, component) frame — file-sourced so the
    planner sees a real scan (an in-memory literal frame would hide a
    would-be Exchange behind a LocalTableScan)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "labels.parquet")
    docs.select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") - F.col("doc_id") % 10).alias("component"),
    ).write.parquet(path)
    return spark.read.parquet(path)


def test_prune_labels_to_endpoints_is_broadcast_semi(spark, tmp_path):
    """The endpoint prune scans the ledger ONCE with the delta's
    endpoint set broadcast: BroadcastHashJoin LeftSemi, zero Exchange,
    zero SortMergeJoin — a corpus-sized label frame is never shuffled
    to translate a handful of new edges."""
    from pyspark.sql import functions as F

    from data_integration_openfoodfacts_spark.operators.graph_incremental import (  # noqa: E501
        prune_labels_to_endpoints,
    )

    labels = _labels_parquet(spark, tmp_path)
    endpoints = labels.select("node").filter(F.col("node") % 97 == 0)
    plan = _plan(prune_labels_to_endpoints(labels, endpoints))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert _shuffle_count(plan) == 0
    assert "SortMergeJoin" not in plan


def test_merge_components_never_shuffles_labels(spark, tmp_path):
    """The full merge output plan: the label ledger appears only under
    broadcast joins (endpoint prune happened pre-mapping and is
    checkpointed; the relabel is labels x broadcast(mapping)) — no
    Exchange, no SortMergeJoin anywhere, and the values still equal
    batch CC over the union edge set."""
    from data_integration_openfoodfacts_spark.functions.localframe import (
        local_rows_df,
    )
    from data_integration_openfoodfacts_spark.operators.graph_incremental import (  # noqa: E501
        merge_components,
    )

    labels = _labels_parquet(spark, tmp_path)
    new_edges = local_rows_df(
        spark,
        [(0, 10), (20, 1_000_000_007), (1_000_000_007, 1_000_000_009)],
        "u long, v long",
    )
    merged = merge_components(labels, new_edges)
    plan = _plan(merged)
    assert _shuffle_count(plan) == 0
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {
        r["node"]: r["component"]
        for r in merged.collect()
        if r["node"] in (0, 5, 10, 15, 20, 25, 1_000_000_007, 1_000_000_009)
    }
    # components 0 and 10 merged to 0 (every member relabels); 20
    # merged with the two fresh nodes (min id 20)
    assert got[0] == 0 and got[10] == 0 and got[5] == 0 and got[15] == 0
    assert got[20] == 20 and got[25] == 20
    assert got[1_000_000_007] == 20 and got[1_000_000_009] == 20


def test_q188_canonical_is_windowed_not_selfjoined(spark):
    """Round-13 optimization pin: q188's canonical member comes from
    `first(doc_id)` over the SAME per-cluster quality window — the
    three rank_fuse windows and the canonical window share ONE
    component exchange, and nothing above that exchange is a join
    (the old shape checkpointed the ranked frame and self-joined it
    back on component)."""
    from data_integration_openfoodfacts_spark.plans.canonical_queries import (  # noqa: E501
        q188_quality_canonical_dedup,
    )

    plan = _plan(q188_quality_canonical_dedup(spark, SF))
    assert plan.count("Window") == 4, plan
    comp_ex = plan.find("Exchange hashpartitioning(component")
    assert comp_ex != -1, plan
    assert plan.count("Exchange hashpartitioning(component") == 1, plan
    assert "Join" not in plan[:comp_ex], plan[:comp_ex]


def test_assign_mean_partials_is_single_corpus_scan(spark):
    """The fused Lloyd sweep input (round 13): scan -> MapInPandas
    emitting per-batch (centroid_id, n, sums) partials — no join of
    the assignment back to the corpus, no corpus shuffle; every
    downstream aggregate handles <= batches x k rows."""
    from data_integration_openfoodfacts_spark.operators.coarse_quantizer import (  # noqa: E501
        assign_mean_partials,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = emb.limit(6).select(
        emb.vec_id.alias("centroid_id"),
        emb.embedding.alias("centroid_vec"),
    )
    for probe in (None, 2):
        plan = _plan(assign_mean_partials(emb, cents, n_probe=probe))
        assert "MapInPandas" in plan
        assert "Join" not in plan
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
