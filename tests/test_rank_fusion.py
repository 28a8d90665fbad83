"""Rank fusion (`operators/rank_fusion.py`): dense-rank tie semantics,
signal direction, exact integer Borda/RRF values against hand
computation, and per-partition independence."""

from __future__ import annotations

import pytest

from data_integration_openfoodfacts_spark.operators.rank_fusion import (
    RRF_K,
    RRF_SCALE,
    rank_fuse,
)


def _rows(df):
    return {r["id"]: (r["borda"], r["rrf_fp"]) for r in df.collect()}


def _rrf(*ranks):
    return sum(RRF_SCALE // (RRF_K + r) for r in ranks)


def test_hand_computed_fusion_with_ties(spark):
    """Two signals; b and c tie on s1 (dense rank shares), directions
    differ (s2 is lower-is-better)."""
    df = spark.createDataFrame(
        [("a", 30, 5), ("b", 20, 1), ("c", 20, 9)],
        "id string, s1 long, s2 long",
    )
    got = _rows(
        rank_fuse(df, "id", [("s1", True), ("s2", False)])
    )
    # s1 desc dense ranks: a=1, b=2, c=2; s2 asc: b=1, a=2, c=3
    assert got == {
        "a": (3, _rrf(1, 2)),
        "b": (3, _rrf(2, 1)),
        "c": (5, _rrf(2, 3)),
    }


def test_partitioned_ranks_are_independent(spark):
    """With partition_by, each group ranks on its own: the worst doc of
    a strong group still gets rank 2 inside its group, not a global
    rank."""
    df = spark.createDataFrame(
        [("a", "x", 100), ("b", "x", 90), ("c", "y", 1), ("d", "y", 2)],
        "id string, g string, s long",
    )
    got = _rows(rank_fuse(df, "id", [("s", True)], partition_by="g"))
    assert got["b"] == (2, _rrf(2))
    assert got["d"] == (1, _rrf(1))
    assert got["c"] == (2, _rrf(2))


def test_single_signal_preserves_order_and_refuses_empty(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "id string, s long"
    )
    got = _rows(rank_fuse(df, "id", [("s", False)]))
    assert got["a"][0] < got["b"][0]
    with pytest.raises(ValueError, match="at least one signal"):
        rank_fuse(df, "id", [])


def test_rank_columns_do_not_leak(spark):
    df = spark.createDataFrame([("a", 1)], "id string, s long")
    out = rank_fuse(df, "id", [("s", True)])
    assert set(out.columns) == {"id", "s", "borda", "rrf_fp"}
