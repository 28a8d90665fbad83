"""Materialized summary maintenance: incremental refresh must equal a
full recompute EXACTLY (decimal state), in any batch order."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.matview import (
    build_summary,
    finalize_summary,
    merge_summaries,
    refresh_materialized_summary,
)

SF_DIR = "/root/testdata/sf0.001"
KEYS = ["o_orderpriority"]
MEASURES = ["o_totalprice"]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    b1 = orders.filter(F.col("o_orderkey") % 3 == 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 1)
    b3 = orders.filter(F.col("o_orderkey") % 3 == 2)
    path = str(tmp_path / "mv")
    for b in (b1, b2, b3):
        state = refresh_materialized_summary(spark, path, b, KEYS, MEASURES)
    got = _rows(finalize_summary(state, MEASURES))
    want = _rows(
        finalize_summary(build_summary(orders, KEYS, MEASURES), MEASURES)
    )
    assert got == want


def test_merge_is_order_independent(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    a = build_summary(
        orders.filter(F.col("o_orderkey") % 2 == 0), KEYS, MEASURES
    )
    b = build_summary(
        orders.filter(F.col("o_orderkey") % 2 == 1), KEYS, MEASURES
    )
    ab = _rows(finalize_summary(merge_summaries(a, b, KEYS, MEASURES), MEASURES))
    ba = _rows(finalize_summary(merge_summaries(b, a, KEYS, MEASURES), MEASURES))
    assert ab == ba


def test_refresh_cost_reads_only_summary(spark, tmp_path):
    """The merge plan must scan the stored summary (tiny) + the batch —
    never historical fact data (which no longer exists anywhere)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "mv")
    refresh_materialized_summary(
        spark, path, orders.limit(100), KEYS, MEASURES
    )
    stored = spark.read.parquet(path)
    assert stored.count() <= 5  # |priorities| rows, not |orders|
    assert "__n" in stored.columns
