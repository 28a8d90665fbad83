"""fastText-style hashed linear quality classifier
(operators/quality_classifier.py) — inference semantics + plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_positive_weights_keep_everything(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "x"), (3, "longer doc here ok")])
    w = spark.range(16).select(
        F.col("id").alias("bucket"), F.lit(1000).cast("long").alias("w_milli")
    )
    out = hashed_linear_score(docs, w, num_buckets=16).collect()
    assert len(out) == 3
    for r in out:
        # every token weighs +1.0 -> mean 1.0 -> sigmoid(1) ~ 0.731
        assert abs(r["score"] - 0.7310585786300049) < 1e-12
        assert r["keep"] is True


def test_all_negative_weights_drop_everything(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "x y")])
    w = spark.range(16).select(
        F.col("id").alias("bucket"),
        F.lit(-1000).cast("long").alias("w_milli"),
    )
    out = hashed_linear_score(docs, w, num_buckets=16).collect()
    assert all(r["keep"] is False for r in out)
    assert all(abs(r["score"] - (1 - 0.7310585786300049)) < 1e-12 for r in out)


def test_n_tokens_is_split_count_and_every_doc_scored(spark):
    docs = _docs(spark, [(1, "one two three four"), (2, ""), (3, "solo")])
    w = synthetic_weights(spark, num_buckets=64)
    out = {r["doc_id"]: r for r in hashed_linear_score(
        docs, w, num_buckets=64
    ).collect()}
    # split("") -> [""]: the empty doc still yields one (hashed) token,
    # so no document silently disappears from the filter decision
    assert out[1]["n_tokens"] == 4
    assert out[2]["n_tokens"] == 1
    assert out[3]["n_tokens"] == 1
    assert all(0.0 < r["score"] < 1.0 for r in out.values())


def test_synthetic_weights_deterministic_and_bounded(spark):
    a = synthetic_weights(spark, num_buckets=128).collect()
    b = synthetic_weights(spark, num_buckets=128).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 128
    assert all(-1000 <= r["w_milli"] <= 1000 for r in a)


def test_quality_bucket_sample_bands_and_clamping(spark):
    from data_integration_openfoodfacts_spark.operators.quality_classifier import (
        quality_bucket_sample,
    )

    scored = spark.createDataFrame(
        [
            (1, 0.10),  # below lo -> clamps to band 0
            (2, 0.41),  # band 0
            (3, 0.45),  # band 1
            (4, 0.52),  # band 3
            (5, 0.99),  # above hi -> clamps to band 4
        ],
        "doc_id long, score double",
    )
    out = {
        r["doc_id"]: r
        for r in quality_bucket_sample(
            scored, rates_permille=[0, 0, 0, 1000, 1000]
        ).collect()
    }
    assert [out[i]["bucket"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 3, 4]
    # rate 0 bands never keep; rate 1000 bands always keep
    assert [out[i]["kept"] for i in (1, 2, 3, 4, 5)] == [
        False, False, False, True, True,
    ]
    assert len(out) == 5  # every doc gets an auditable decision row


def test_quality_bucket_sample_deterministic_rates(spark):
    """Uniform scores into one band at rate 500: the md5 draw keeps
    ~half, and re-running keeps the IDENTICAL subset."""
    from data_integration_openfoodfacts_spark.operators.quality_classifier import (
        quality_bucket_sample,
    )

    scored = spark.createDataFrame(
        [(i, 0.5) for i in range(1000)], "doc_id long, score double"
    )
    kept1 = sorted(
        r["doc_id"]
        for r in quality_bucket_sample(
            scored, rates_permille=[500, 500, 500, 500, 500]
        ).collect()
        if r["kept"]
    )
    kept2 = sorted(
        r["doc_id"]
        for r in quality_bucket_sample(
            scored, rates_permille=[500, 500, 500, 500, 500]
        ).collect()
        if r["kept"]
    )
    assert kept1 == kept2
    assert 400 < len(kept1) < 600


def test_plan_broadcasts_weights_single_doc_shuffle(spark):
    docs = _docs(spark, [(1, "a b"), (2, "c")])
    w = synthetic_weights(spark, num_buckets=256)
    plan = (
        hashed_linear_score(docs, w, num_buckets=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(doc_id") == 1


def test_sparse_weight_table_left_join_semantics(spark):
    """A trained weight table may omit zero-weight buckets. Tokens
    missing from the table must count toward n_tokens with weight 0,
    and a doc whose tokens ALL miss the table must still get a row
    (round-5 advisor finding: the old inner join dropped both)."""
    docs = _docs(spark, [(1, "a b c d"), (2, "a a")])
    # keep only the buckets that none of doc 2's tokens hash into:
    # compute doc tokens' buckets, then build a table missing them all.
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        md5_long,
    )

    tok_buckets = {
        r["b"]
        for r in spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",)], "tok string"
        )
        .select(F.pmod(md5_long(F.col("tok")), F.lit(16)).alias("b"))
        .collect()
    }
    a_bucket = (
        spark.createDataFrame([("a",)], "tok string")
        .select(F.pmod(md5_long(F.col("tok")), F.lit(16)).alias("b"))
        .collect()[0]["b"]
    )
    sparse = (
        spark.range(16)
        .filter(~F.col("id").isin(*[int(b) for b in tok_buckets]))
        .select(
            F.col("id").alias("bucket"),
            F.lit(1000).cast("long").alias("w_milli"),
        )
    )
    out = {r["doc_id"]: r for r in hashed_linear_score(
        docs, sparse, num_buckets=16
    ).collect()}
    assert set(out) == {1, 2}, "doc with zero table hits must still appear"
    assert out[1]["n_tokens"] == 4  # all tokens counted, hit or miss
    assert out[2]["n_tokens"] == 2
    # all-miss doc: integer sum 0 -> mean 0 -> sigmoid(0) = 0.5 exactly
    assert out[2]["score"] == 0.5
    assert a_bucket in tok_buckets  # sanity: the filter really excluded "a"
