"""Leakage-guarded split (q151) and n-gram novelty (q152) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    minhash_lsh_pairs,
)
from data_integration_openfoodfacts_spark.plans.curation_queries import (
    q151_leakage_guarded_split,
    q152_ngram_novelty,
)

SF_DIR = "/root/testdata/sf0.001"


def test_q151_no_cluster_straddles_splits(spark):
    out = q151_leakage_guarded_split(spark, SF_DIR).cache()
    # every document exactly once
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert out.count() == n_docs
    # one split per component — the leakage guarantee
    straddlers = (
        out.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert straddlers == 0


def test_q151_near_dup_pairs_share_split(spark):
    """The guarantee restated pairwise: every MinHash candidate pair
    (the edges the clusters were built from) ends up co-split."""
    out = q151_leakage_guarded_split(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=8, band_size=2
    )
    sa = out.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sp_a"))
    sb = out.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sp_b"))
    crossed = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("sp_a") != F.col("sp_b"))
        .count()
    )
    assert crossed == 0


def test_q151_split_is_component_pure_function(spark):
    """Same component id -> same split label, independent of which doc
    carries it (layout/order independence of the md5 assignment)."""
    out = q151_leakage_guarded_split(spark, SF_DIR)
    re_out = q151_leakage_guarded_split(spark, SF_DIR)
    assert (
        out.exceptAll(re_out).count() == 0
        and re_out.exceptAll(out).count() == 0
    )


def test_q152_novelty_bounds_and_first_doc(spark):
    out = q152_ngram_novelty(spark, SF_DIR).cache()
    bad = out.filter(
        (F.col("novelty") < 0)
        | (F.col("novelty") > 1)
        | (F.col("n_novel") > F.col("n_shingles"))
    ).count()
    assert bad == 0
    # zero-novelty docs (assembled entirely from already-seen text)
    # exist in this corpus — the signal the query is for
    assert out.filter(F.col("novelty") == 0).count() > 0
    # the smallest doc_id with shingles owns every first occurrence
    first = out.orderBy("doc_id").first()
    assert first["novelty"] == 1.0


def test_q153_copy_indices_contiguous_and_deterministic(spark):
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q153_epoch_upsampling,
    )

    out = q153_epoch_upsampling(spark, SF_DIR).cache()
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("copy_idx").alias("lo"),
        F.max("copy_idx").alias("hi"),
        F.countDistinct("copy_idx").alias("nd"),
    )
    # copies are exactly 0..n-1 per emitted doc
    broken = per_doc.filter(
        (F.col("lo") != 0)
        | (F.col("hi") != F.col("n") - 1)
        | (F.col("nd") != F.col("n"))
    ).count()
    assert broken == 0
    # fractional rates really both up- AND down-sample this corpus
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    emitted_docs = per_doc.count()
    assert emitted_docs < n_docs  # some r < 1 docs dropped
    assert out.count() > emitted_docs  # some r > 1 docs duplicated
    # deterministic replay
    again = q153_epoch_upsampling(spark, SF_DIR)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0


def test_q154_mean_mahalanobis_equals_dimension_count(spark):
    """Per dimension, E[(x - mu)^2 / var] = 1 exactly under the biased
    variance the query computes — so the corpus mean of maha2 must be
    the number of kept (var > 0) dimensions, up to the decimal(18,6)
    term quantization."""
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q154_embedding_outliers,
    )

    out = q154_embedding_outliers(spark, SF_DIR)
    mean = out.agg(F.avg("maha2")).first()[0]
    assert abs(mean - 64.0) < 0.01
    assert out.filter(F.col("maha2") < 0).count() == 0


def test_q154_and_q127_plans_broadcast_index_never_sortmerge(spark):
    """The Gram/Mahalanobis expansion must be a broadcast of the tiny
    constant index — never a shuffled join of the data side."""
    from data_integration_openfoodfacts_spark.plans.registry import QUERIES

    for name in ("q154_embedding_outliers", "q127_embedding_gram"):
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_q155_fertility_consistency(spark):
    """Per-language sums must reconcile with q21's per-document token
    counts, and fertility must be finite and >= 1 token per word on
    this corpus (the BPE-ish regex never merges across whitespace)."""
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q155_tokenizer_fertility,
    )
    from data_integration_openfoodfacts_spark.plans.llm_queries import (
        q21_text_stats,
    )

    out = q155_tokenizer_fertility(spark, SF_DIR).cache()
    doc_totals = q21_text_stats(spark, SF_DIR).agg(
        F.sum("ws_tokens").alias("w"), F.sum("bpe_tokens").alias("b")
    ).first()
    lang_totals = out.agg(
        F.sum("ws_tokens").alias("w"), F.sum("bpe_tokens").alias("b")
    ).first()
    assert (doc_totals["w"], doc_totals["b"]) == (
        lang_totals["w"],
        lang_totals["b"],
    )
    assert out.filter(F.col("fertility") < 1.0).count() == 0


def test_q156_profile_reconciles_with_corpus(spark):
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q156_corpus_source_profile,
    )

    out = q156_corpus_source_profile(spark, SF_DIR).cache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # totals reconcile
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    # rates bounded; unique <= docs; kept <= docs
    bad = out.filter(
        (F.col("keep_rate") < 0)
        | (F.col("keep_rate") > 1)
        | (F.col("exact_dup_rate") < 0)
        | (F.col("exact_dup_rate") > 1)
        | (F.col("n_unique_texts") > F.col("n_docs"))
        | (F.col("n_kept") > F.col("n_docs"))
    ).count()
    assert bad == 0


def test_new_query_plan_shapes(spark):
    """Scale-posture pins for the curation queries: q153 is pure
    narrow (ZERO Exchange — rate, draw and copy explode are per-row
    expressions); none of the family ever degenerates to a cartesian
    product; q156 carries the documented Expand from its two
    COUNT(DISTINCT) columns (so a 'simplification' that silently adds
    a third distinct or drops the rewrite shows up here)."""
    from data_integration_openfoodfacts_spark.plans.registry import QUERIES

    def plan(name):
        return (
            QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p153 = plan("q153_epoch_upsampling")
    assert "Exchange" not in p153
    for name in (
        "q151_leakage_guarded_split",
        "q152_ngram_novelty",
        "q156_corpus_source_profile",
    ):
        assert "CartesianProduct" not in plan(name), name
    assert "Expand" in plan("q156_corpus_source_profile")


def test_q157_curve_reconciles_with_q152(spark):
    """Tranche totals must be exactly q152's per-document totals.
    (No monotonicity assertion: first occurrences accrue to earlier
    doc_ids, but a tranche's rate also reflects its INTERNAL
    duplication, so tranche 0 need not be the max.)"""
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q152_ngram_novelty,
        q157_novelty_curve,
    )

    curve = q157_novelty_curve(spark, SF_DIR).cache()
    per_doc = q152_ngram_novelty(spark, SF_DIR)
    want = per_doc.agg(
        F.sum("n_shingles").alias("s"), F.sum("n_novel").alias("n")
    ).first()
    got = curve.agg(
        F.sum("n_shingles").alias("s"), F.sum("n_novel").alias("n")
    ).first()
    assert (want["s"], want["n"]) == (got["s"], got["n"])
    rows = {r["tranche"]: r["novelty_rate"] for r in curve.collect()}
    assert set(rows) <= set(range(10))
    assert all(0 <= v <= 1 for v in rows.values())


def test_q152_duplicate_doc_has_zero_novelty(spark):
    """A verbatim copy of an earlier doc contributes nothing new."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "a b c d e f g h i j"),  # exact dup of 1
            (3, "k l m n o p q r s t"),
        ],
        ["doc_id", "text"],
    )
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        word_shingles,
    )

    sh = word_shingles(df, "doc_id", "text", n=8)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    nov = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("first_doc") == F.col("doc_id"), 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1))
            ).alias("novelty")
        )
    )
    rows = {r["doc_id"]: r["novelty"] for r in nov.collect()}
    assert rows[1] == 1.0 and rows[2] == 0.0 and rows[3] == 1.0
