"""KMV bottom-k sketch (operators/kmv.py): estimator accuracy vs
exact counts, the union identity, and merge properties. Cross-engine
value exactness is q162's oracle gate; THIS file pins that the
estimates are actually good."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.kmv import (
    kmv_estimate,
    kmv_jaccard,
    kmv_sketch,
    kmv_union,
)
from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    word_shingles,
)
from data_integration_openfoodfacts_spark.sources.parquet_source import (
    load_table,
)

SF = "/root/testdata/sf0.001"
K = 256


def _sides(spark):
    docs = load_table(spark, SF, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=8)
    a = sh.filter(F.col("doc_id") % 2 == 0)
    b = sh.filter(F.col("doc_id") % 2 == 1)
    return a, b


def test_distinct_estimate_within_ksigma(spark):
    """(k-1)*M/h_k with k=256 has ~1/sqrt(k) ~ 6% relative sd; assert
    within 20% (>3 sd) of the exact distinct count on both sides."""
    a, b = _sides(spark)
    for side in (a, b):
        exact = side.select("shingle").distinct().count()
        est = kmv_estimate(
            kmv_sketch(side, "shingle", K), K
        ).collect()[0]["est_distinct"]
        assert abs(est - exact) / exact < 0.20, (est, exact)


def test_union_sketch_identity(spark):
    """k-smallest of merged sketches == KMV sketch of the underlying
    union — the exactness that makes KMV mergeable."""
    a, b = _sides(spark)
    sa = kmv_sketch(a, "shingle", K)
    sb = kmv_sketch(b, "shingle", K)
    merged = {r["h"] for r in kmv_union(sa, sb, K).collect()}
    direct = {
        r["h"]
        for r in kmv_sketch(a.unionByName(b), "shingle", K).collect()
    }
    assert merged == direct


def test_jaccard_estimate_close_to_exact(spark):
    a, b = _sides(spark)
    sa_set = {r["shingle"] for r in a.select("shingle").distinct().collect()}
    sb_set = {r["shingle"] for r in b.select("shingle").distinct().collect()}
    exact_j = len(sa_set & sb_set) / len(sa_set | sb_set)
    est = kmv_jaccard(
        kmv_sketch(a, "shingle", K), kmv_sketch(b, "shingle", K), K
    ).collect()[0]["jaccard_est"]
    assert abs(est - exact_j) < 0.15, (est, exact_j)


def test_small_set_is_exact(spark):
    """A set smaller than k is stored whole — the estimate is exact."""
    df = spark.createDataFrame(
        [(i, f"elem-{i}") for i in range(40)], "id long, e string"
    )
    out = kmv_estimate(kmv_sketch(df, "e", K), K).collect()[0]
    assert out["n_mins"] == 40
    assert out["est_distinct"] == 40.0


def test_sketch_plan_is_take_ordered(spark):
    a, _ = _sides(spark)
    plan = (
        kmv_sketch(a, "shingle", K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_null_elements_excluded(spark):
    """NULL elements must not enter the sketch: Spark sorts NULL h
    FIRST ascending (it would displace real minima) while DuckDB sorts
    it LAST — the round-7 ADVICE cross-engine corruption. The sketch of
    a column with NULLs equals the sketch of the non-null subset."""
    df = spark.createDataFrame(
        [(i, f"elem-{i}" if i % 3 else None) for i in range(60)],
        "id long, e string",
    )
    with_nulls = {r["h"] for r in kmv_sketch(df, "e", K).collect()}
    clean = {
        r["h"]
        for r in kmv_sketch(df.filter("e IS NOT NULL"), "e", K).collect()
    }
    assert with_nulls == clean
    assert None not in with_nulls
