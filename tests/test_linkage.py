"""Blocked fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.linkage import (
    blocked_fuzzy_pairs,
)


def _df(spark):
    rows = [
        (1, "acme corp"), (2, "acme c0rp"),      # distance 1, same block
        (3, "acme unrelated thing"),              # same block, far
        (4, "zenith ltd"), (5, "zenith ltd"),     # identical pair
        (6, "other co"),
    ] + [(100 + i, "hot dup") for i in range(30)]  # degenerate block
    return spark.createDataFrame(rows, ["rid", "name"])


def test_blocked_pairs_within_distance(spark):
    df = _df(spark)
    block = F.split(F.col("name"), " ").getItem(0)
    out = blocked_fuzzy_pairs(df, "rid", "name", block, max_distance=2)
    pairs = {(r["key_a"], r["key_b"]): r["distance"] for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(4, 5)] == 0
    assert (1, 3) not in pairs  # same block but beyond the distance cap
    assert (1, 4) not in pairs  # different block never meets


def test_block_size_cap_drops_degenerate_block(spark):
    df = _df(spark)
    block = F.split(F.col("name"), " ").getItem(0)
    uncapped = blocked_fuzzy_pairs(df, "rid", "name", block, 2)
    capped = blocked_fuzzy_pairs(df, "rid", "name", block, 2,
                                 max_block_size=10)
    # the 30-member "hot" block contributes 435 identical pairs uncapped
    assert uncapped.count() == capped.count() + 30 * 29 // 2
    assert capped.filter("key_a >= 100").count() == 0
    # the real matches survive the cap
    kept = {(r["key_a"], r["key_b"]) for r in capped.collect()}
    assert {(1, 2), (4, 5)} <= kept
