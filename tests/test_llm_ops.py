"""Unit tests for the LLM-pipeline operators: near-dup dedup, similarity
search, text analysis."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.functions.text_analysis import (
    bpe_ish_token_count,
    quality_score,
    rolling_fingerprint,
    whitespace_token_count,
)
from data_integration_openfoodfacts_spark.operators.similarity import (
    assign_to_centroids,
    cosine_topk,
)
from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "completely different text with no overlap at all here"),
    (4, "tiny"),  # < 3 tokens -> no shingles
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_word_shingles_counts(spark):
    sh = word_shingles(_docs(spark), "doc_id", "text", 3)
    per_doc = {r["doc_id"]: r["n"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc[1] == 7  # 9 tokens -> 7 shingles
    assert 4 not in per_doc  # too short


def test_ngram_jaccard_finds_neardup(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), "doc_id", "text", 3, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p["id_a"], p["id_b"]) == (1, 2)
    # 6 shared of 7+7 shingles -> 6/8
    assert abs(p["jaccard"] - 0.75) < 1e-12


def test_minhash_lsh_candidates_superset_of_true_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(_docs(spark), "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # jaccard .75 collides w.h.p. with 4 bands of 2
    assert (1, 3) not in pairs


def test_simhash_close_for_neardups(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark), "doc_id", "text").collect()}
    d12 = bin(out[1] ^ out[2]).count("1")
    d13 = bin(out[1] ^ out[3]).count("1")
    assert d12 < d13  # near-dup closer in hamming space
    assert 0 <= out[1] < 2**16


def test_simhash_deterministic(spark):
    a = simhash(_docs(spark), "doc_id", "text").collect()
    b = simhash(_docs(spark), "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cosine_topk_orders_by_similarity(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(emb, 0, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] > 0.99


def test_assign_to_centroids_ties_break_low(spark):
    emb = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])],
        "centroid_id long, centroid_vec array<float>",
    )
    out = assign_to_centroids(emb, cents).collect()
    assert out[0]["centroid_id"] == 0


def test_token_counts(spark):
    df = spark.createDataFrame([("ab 12 cd-ef",)], "text string")
    r = df.select(
        whitespace_token_count("text").alias("ws"),
        bpe_ish_token_count("text").alias("bpe"),
    ).first()
    assert r["ws"] == 3
    assert r["bpe"] == 5  # ab / 12 / cd / - / ef


def test_quality_score_range(spark):
    df = spark.createDataFrame([("the " * 30,), ("!!!",)], "text string")
    vals = [r["q"] for r in df.select(quality_score("text").alias("q")).collect()]
    assert all(0 <= v <= 3 for v in vals)
    assert vals[0] > vals[1]


def test_rolling_fingerprint_known_value(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    got = df.select(rolling_fingerprint("text").alias("f")).first()["f"]
    assert got == (97 * 31 + 98) % 1_000_000_007


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("ab",), ("ba",)], "text string")
    vals = {r["f"] for r in df.select(rolling_fingerprint("text").alias("f")).collect()}
    assert len(vals) == 2
