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


def test_diff_self_is_all_same(spark):
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    out = table_diff(orders, orders, ["o_orderkey"], cols)
    assert out.filter("status != 'same'").count() == 0
    assert out.count() == orders.count()


def test_diff_counts_are_symmetric(spark):
    """removed(old,new) == added(new,old) and changed is symmetric."""
    old = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(i, f"v{i}" if i % 3 else "MOD") for i in range(5, 25)],
        "k long, v string",
    )
    def counts(a, b):
        rows = table_diff(a, b, ["k"], ["v"]).groupBy("status").count().collect()
        return {r["status"]: r["count"] for r in rows}

    f, r = counts(old, new), counts(new, old)
    assert f.get("removed", 0) == r.get("added", 0)
    assert f.get("added", 0) == r.get("removed", 0)
    assert f.get("changed", 0) == r.get("changed", 0)


def test_table_checksum_order_and_partition_invariant(spark):
    from data_integration_openfoodfacts_spark.operators.diff import (
        table_checksum,
    )

    rows = [(1, "a"), (2, None), (3, "c")]
    a = spark.createDataFrame(rows, "k long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "k long, v string").repartition(7)
    ca = table_checksum(a, ["k", "v"]).first()
    cb = table_checksum(b, ["k", "v"]).first()
    assert (ca.n_rows, ca.checksum, ca.checksum_sq) == (
        cb.n_rows, cb.checksum, cb.checksum_sq
    )
    # any single-value change moves the checksum
    c = spark.createDataFrame(
        [(1, "a"), (2, "x"), (3, "c")], "k long, v string"
    )
    cc = table_checksum(c, ["k", "v"]).first()
    assert cc.checksum != ca.checksum
