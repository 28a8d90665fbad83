"""Plan-shape pins for the round-12 surface: q151's star-edge CC
input, q198's k∝n SemDeDup, `gemm_assign`'s Arrow-only shape, and the
one-partition layout of driver-literal frames (q199 runs a store
lifecycle on call; its properties are pinned by the stream suites)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q151_star_edges_have_no_pair_self_join(spark):
    """Round 12: CC input is LSH bucket stars (one window over the
    band table), not the all-intra-bucket pair graph — the band
    self-join and pair groupBy are gone, so a hot bucket can never
    emit m^2/2 edges. Pin the EDGE PLAN (the query itself runs CC's
    iterative driver loop on call, so we pin its input stage)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (  # noqa: E501
        minhash_band_signatures,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, SF, "documents")
    bands = minhash_band_signatures(
        docs, "doc_id", "text", n=3, num_hashes=8, band_size=2
    )
    w = Window.partitionBy("band", "sig")
    star = (
        bands.withColumn("root", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("id_a"), F.col("doc_id").alias("id_b"))
    )
    plan = _plan(star)
    assert "Window" in plan
    assert "Join" not in plan  # no band-table self-join anywhere
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_q198_semdedup_plan(spark):
    """k∝n SemDeDup, pinned in two halves (semantic_dedup eagerly
    checkpoints the assignment, so the returned plan starts at an
    ExistingRDD): the ASSIGNMENT stage broadcasts the centroids
    (never a shuffle of the corpus against them); the returned
    dedup stage has no cartesian, no row-at-a-time Python, and no
    single-partition exchange."""
    from data_integration_openfoodfacts_spark.operators.clustering import (
        fit_centroids_lloyd,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        assign_to_centroids,
        semdedup_k,
    )
    from data_integration_openfoodfacts_spark.plans.policy_queries import (
        q198_semdedup_fixed_cluster,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = fit_centroids_lloyd(emb, k=semdedup_k(emb.count()))
    assign_plan = _plan(assign_to_centroids(emb, cents))
    assert "BroadcastNestedLoopJoin" in assign_plan  # centroid scoring
    assert "CartesianProduct" not in assign_plan

    plan = _plan(q198_semdedup_fixed_cluster(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # no global sort anywhere (dedup verdicts are per-row/per-pair)
    assert "Exchange SinglePartition" not in plan


def test_gemm_assign_is_arrow_only(spark):
    """The GEMM assigner's plan is scan -> mapInPandas: no join, no
    exchange of scored rows — the n x k score matrix never exists as
    Spark rows (the fold path's measured bottleneck at k∝n)."""
    from data_integration_openfoodfacts_spark.operators.gemm_scan import (
        gemm_assign,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, SF, "embeddings")
    cents = emb.limit(4).select(
        emb.vec_id.alias("centroid_id"),
        emb.embedding.alias("centroid_vec"),
    )
    plan = _plan(gemm_assign(emb, cents))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_local_rows_df_is_one_partition(spark):
    """functions/localframe: driver-literal frames are ONE slice, so
    no action ever fans a handful of literal rows across 32 Python
    workers (the measured 5.7s-per-1-row-write tax, round 12)."""
    from data_integration_openfoodfacts_spark.functions.localframe import (
        local_rows_df,
    )

    df = local_rows_df(spark, [(1, "a"), (2, "b")], "k long, v string")
    assert df.rdd.getNumPartitions() == 1
    assert [(r["k"], r["v"]) for r in df.orderBy("k").collect()] == [
        (1, "a"), (2, "b"),
    ]
    empty = local_rows_df(spark, [], "k long, v string")
    assert empty.rdd.getNumPartitions() == 1
    assert empty.count() == 0
