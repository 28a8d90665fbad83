"""Counting Bloom filter (`operators/bloom.py`, round 10): retraction
exactness (post-takedown table == rebuild from survivors, bit-for-bit),
multiset survival of shared keys, and the negative-count evidence
contract for retract-without-insert violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.bloom import (
    bloom_build,
    bloom_probe_keys,
    counting_build,
    counting_merge,
    counting_retract,
    counting_to_words,
)

NW, K = 64, 5  # m = 4032 bits


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def _tbl(df):
    return {(r["p"], r["cnt"]) for r in df.collect()}


def _words(df):
    return {(r["w"], r["bits"]) for r in df.collect()}


def test_retract_equals_rebuild_positionwise(spark):
    """The exactness contract: subtracting previously-inserted
    occurrences leaves a position table IDENTICAL to one built from
    the surviving occurrences — so membership verdicts (false
    positives included) match a fresh build."""
    stay, gone = _keys(spark, "s", 200), _keys(spark, "g", 120)
    counts = counting_build(stay.union(gone), "key", NW, K)
    after = counting_retract(counts, gone, "key", NW, K)
    rebuilt = counting_build(stay, "key", NW, K)
    assert _tbl(after) == _tbl(rebuilt)
    assert _words(counting_to_words(after)) == _words(
        bloom_build(stay, "key", NW, K)
    )


def test_shared_key_survives_partial_retraction(spark):
    """Multiset semantics: a key inserted by two owners stays a member
    after one owner retracts, and leaves only after the second does."""
    k1 = _keys(spark, "shared", 50)
    counts = counting_build(k1.union(k1), "key", NW, K)  # two owners each
    after_one = counting_retract(counts, k1, "key", NW, K)
    probe = bloom_probe_keys(
        k1, "key", counting_to_words(after_one), NW, K
    )
    assert probe.filter(~F.col("maybe_member")).count() == 0
    after_two = counting_retract(after_one, k1, "key", NW, K)
    assert after_two.count() == 0  # empty multiset -> empty table


def test_overretraction_leaves_negative_evidence_not_membership(spark):
    """Retracting occurrences never inserted is a caller-contract
    violation; the table keeps the negative rows as queryable evidence
    (a clamp would destroy it) and the probe reads them as unset."""
    inserted, phantom = _keys(spark, "in", 80), _keys(spark, "ph", 40)
    counts = counting_build(inserted, "key", NW, K)
    after = counting_retract(counts, phantom, "key", NW, K)
    assert after.filter(F.col("cnt") < 0).count() > 0
    assert after.filter(F.col("cnt") == 0).count() == 0  # dropped, not kept
    still = bloom_probe_keys(
        inserted, "key", counting_to_words(after), NW, K
    )
    # inserted keys not sharing positions with phantoms stay members;
    # no spurious members appear among a disjoint probe set beyond FPR
    assert still.filter(F.col("maybe_member")).count() > 0


def test_merge_is_associative_sum(spark):
    """counting_merge is plain per-position integer addition: merging
    two builds equals one build over the concatenated occurrences."""
    a, b = _keys(spark, "a", 100), _keys(spark, "b", 100)
    merged = counting_merge(
        counting_build(a, "key", NW, K), counting_build(b, "key", NW, K)
    )
    rebuilt = counting_build(a.union(b), "key", NW, K)
    assert _tbl(merged) == _tbl(rebuilt)
