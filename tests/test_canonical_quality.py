"""Quality-canonical dedup (plans/canonical_queries.py): the canonical
member is the quality argmax, NOT the min id — pinned on a fixture
where the lowest-id cluster member is the worst one."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.graph import (
    connected_components,
)
from data_integration_openfoodfacts_spark.operators.rank_fusion import (
    rank_fuse,
)
from pyspark.sql.window import Window


def test_canonical_is_quality_argmax_not_min_id(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),                       # cluster A, short
        (2, base + " iota kappa " + base),  # cluster A, richest
        (9, "totally different words everywhere now right here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    cc = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    sig = docs.select(
        "doc_id", F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long").alias("n_distinct_tokens"),
    )
    members = cc.join(sig, cc["node"] == sig["doc_id"]).select(
        "doc_id", "component", "n_chars", "n_tokens", "n_distinct_tokens"
    )
    fused = rank_fuse(
        members, "doc_id",
        [("n_chars", True), ("n_tokens", True),
         ("n_distinct_tokens", True)],
        partition_by="component",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("borda").asc(), F.md5(F.col("doc_id").cast("string"))
    )
    winner = (
        fused.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    )
    assert len(winner) == 1  # one cluster {1, 2}; doc 9 is unclustered
    # min-id canonical would pick 1; quality fusion must pick 2
    assert winner[0]["doc_id"] == 2
