"""Sampling/sharding operators: determinism under repartitioning is the
contract (the whole reason these exist instead of df.sample())."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.sampling import (
    assign_shards,
    deterministic_sample,
    stratified_sample_exact,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_sample_stable_under_repartition(docs):
    base = _ids(deterministic_sample(docs, "doc_id", 0.2))
    shuffled = _ids(deterministic_sample(docs.repartition(7), "doc_id", 0.2))
    assert base == shuffled
    assert 0 < len(base) < docs.count()


def test_sample_rate_roughly_honored(docs):
    n = docs.count()
    got = len(_ids(deterministic_sample(docs, "doc_id", 0.5)))
    assert abs(got / n - 0.5) < 0.15


def test_sample_salt_changes_selection(docs):
    a = _ids(deterministic_sample(docs, "doc_id", 0.2, salt="a"))
    b = _ids(deterministic_sample(docs, "doc_id", 0.2, salt="b"))
    assert a != b


def test_sample_rate_bounds(docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_stratified_exact_k_per_stratum(docs):
    out = stratified_sample_exact(docs, ["source"], "doc_id", k=5)
    per = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {s: min(5, n) for s, n in sizes.items()}


def test_stratified_stable_under_repartition(docs):
    a = _ids(stratified_sample_exact(docs, ["source"], "doc_id", k=7))
    b = _ids(stratified_sample_exact(docs.repartition(9), ["source"], "doc_id", k=7))
    assert a == b


def test_stratified_k_validation(docs):
    with pytest.raises(ValueError):
        stratified_sample_exact(docs, ["source"], "doc_id", k=0)


def test_shards_in_range_and_stable(docs):
    out = assign_shards(docs, "doc_id", n_shards=8)
    stats = out.agg(
        F.min("shard").alias("lo"),
        F.max("shard").alias("hi"),
        F.countDistinct("shard").alias("nd"),
    ).first()
    assert 0 <= stats.lo and stats.hi <= 7 and stats.nd == 8
    a = sorted((r.doc_id, r.shard) for r in out.select("doc_id", "shard").collect())
    b = sorted(
        (r.doc_id, r.shard)
        for r in assign_shards(docs.repartition(5), "doc_id", n_shards=8)
        .select("doc_id", "shard")
        .collect()
    )
    assert a == b


def test_shards_validation(docs):
    with pytest.raises(ValueError):
        assign_shards(docs, "doc_id", n_shards=0)


def test_weighted_sample_topk_properties(spark):
    from data_integration_openfoodfacts_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 1.0 if i != 42 else 1e9) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    picked = weighted_sample_topk(df, "id", "w", k=10)
    ids = {r["id"] for r in picked.collect()}
    assert len(ids) == 10
    # ln(u)/1e9 ~ 0 beats every unit-weight key: the heavy row wins
    assert 42 in ids
    # partition-layout independence: same set after a repartition
    ids2 = {
        r["id"]
        for r in weighted_sample_topk(
            df.repartition(7), "id", "w", k=10
        ).collect()
    }
    assert ids2 == ids
    # k >= n degenerates to the full set
    assert weighted_sample_topk(df, "id", "w", k=500).count() == 100


def test_weighted_sample_topk_rejects_bad_k(spark):
    import pytest as _pytest

    from data_integration_openfoodfacts_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, w double")
    with _pytest.raises(ValueError):
        weighted_sample_topk(df, "id", "w", k=0)


def test_weighted_sample_topk_excludes_invalid_weights(spark):
    from data_integration_openfoodfacts_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(1, 1.0), (2, -5.0), (3, 0.0), (4, None), (5, 2.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    ids = {r["id"] for r in weighted_sample_topk(df, "id", "w", k=10).collect()}
    # negative weight would otherwise get a POSITIVE key and always win
    assert ids == {1, 5}


def test_mixture_sample_shares_and_edge_cases(spark):
    from data_integration_openfoodfacts_spark.operators.sampling import (
        mixture_sample,
    )

    rows = (
        [(i, "web") for i in range(1000)]
        + [(i + 1000, "books") for i in range(100)]
        + [(i + 2000, "tiny") for i in range(5)]
        + [(i + 3000, "untargeted") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "id long, grp string")
    out = mixture_sample(
        df, "grp", "id",
        targets={"web": 0.5, "books": 0.2, "tiny": 0.3},
        budget=200,
    ).groupBy("grp").count()
    counts = {r["grp"]: r["count"] for r in out.collect()}
    # web: rate 100/1000=0.1 -> ~100 of 1000 (binomial, wide margin)
    assert 60 <= counts["web"] <= 140
    # books: rate min(1, 40/100)=0.4 -> ~40
    assert 20 <= counts["books"] <= 60
    # tiny: allocation 60 > size 5 -> kept whole, never upsampled
    assert counts["tiny"] == 5
    # untargeted group dropped entirely
    assert "untargeted" not in counts
    # determinism across layout
    again = mixture_sample(
        df.repartition(13), "grp", "id",
        targets={"web": 0.5, "books": 0.2, "tiny": 0.3},
        budget=200,
    )
    assert {r["id"] for r in again.collect()} == {
        r["id"]
        for r in mixture_sample(
            df, "grp", "id",
            targets={"web": 0.5, "books": 0.2, "tiny": 0.3},
            budget=200,
        ).collect()
    }
