"""Distributed Bloom filter (`operators/bloom.py`, round 10): the
no-false-negative contract, mergeability, determinism, and the
broadcast-probe plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_positions,
    bloom_probe_keys,
    bloom_union,
)

NW, K = 64, 5  # m = 4032 bits


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def _words(df):
    return {(r["w"], r["bits"]) for r in df.collect()}


def test_no_false_negatives_and_bounded_fpr(spark):
    """Every inserted key probes maybe_member=true (the Bloom
    contract, deterministic by construction); a disjoint probe set
    sees a small false-positive rate (300 keys in 4032 bits, k=5:
    theory ~0.5%; assert a loose <5% so the test pins the mechanism,
    not the noise)."""
    members = _keys(spark, "in", 300)
    bloom = bloom_build(members, "key", NW, K).localCheckpoint(eager=True)
    got = bloom_probe_keys(members, "key", bloom, NW, K)
    assert got.filter(~F.col("maybe_member")).count() == 0
    fresh = bloom_probe_keys(_keys(spark, "out", 400), "key", bloom, NW, K)
    fp = fresh.filter(F.col("maybe_member")).count()
    assert fp / 400 < 0.05, fp


def test_union_equals_rebuild_and_build_is_idempotent(spark):
    """bit_or mergeability: union of two filters == one filter over
    the union of keys; duplicate input rows change nothing."""
    a, b = _keys(spark, "a", 150), _keys(spark, "b", 150)
    merged = bloom_union(
        bloom_build(a, "key", NW, K), bloom_build(b, "key", NW, K)
    )
    rebuilt = bloom_build(a.union(b), "key", NW, K)
    assert _words(merged) == _words(rebuilt)
    dup = bloom_build(a.union(a).union(a), "key", NW, K)
    assert _words(dup) == _words(bloom_build(a, "key", NW, K))


def test_positions_in_range_and_words_nonnegative(spark):
    """63-bit words keep every stored long non-negative (the signed
    overflow divergence guard: DuckDB raises where the JVM wraps), and
    every position lands in [0, n_words*63)."""
    df = _keys(spark, "k", 500).select(
        F.explode(bloom_positions(F.col("key"), NW, K)).alias("p")
    )
    lo, hi = df.agg(F.min("p"), F.max("p")).first()
    assert lo >= 0 and hi < NW * WORD_BITS
    words = bloom_build(_keys(spark, "k", 500), "key", NW, K)
    assert words.filter(F.col("bits") < 0).count() == 0
    assert words.count() <= NW


def test_probe_plan_broadcasts_filter_never_cartesian(spark):
    """Scale-posture pin: the probe hash-joins the BROADCAST word
    table (O(n_words) rows) — the probe side is the only thing
    shuffled; no cartesian product, no Python in the plan."""
    members = _keys(spark, "in", 100)
    bloom = bloom_build(members, "key", NW, K).localCheckpoint(eager=True)
    plan = (
        bloom_probe_keys(_keys(spark, "p", 1000), "key", bloom, NW, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
