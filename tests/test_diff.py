"""Keyed table diff (operators/diff.py)."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.operators.diff import table_diff


def test_table_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y")],
        "k long, v string, w string",
    )
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "CHANGED", "y"), (4, "d", "z")],
        "k long, v string, w string",
    )
    out = {
        r["k"]: r["status"]
        for r in table_diff(old, new, ["k"], ["v", "w"]).collect()
    }
    assert out == {1: "removed", 2: "same", 3: "changed", 4: "added"}


def test_null_not_conflated_with_empty(spark):
    old = spark.createDataFrame([(1, None, "x")], "k long, v string, w string")
    new = spark.createDataFrame([(1, "", "x")], "k long, v string, w string")
    out = table_diff(old, new, ["k"], ["v", "w"]).collect()
    assert out[0]["status"] == "changed"
