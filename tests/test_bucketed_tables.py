"""Bucketed persistent tables (`sources/bucketed_tables.py`): the
exchange-free co-located join plan, value parity with a plain join,
the mismatched-bucket-count and path-read regressions (both pinned AS
regressions — they document what breaks the contract), and bucket
pruning for point lookups."""

from __future__ import annotations

import contextlib
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.sources.bucketed_tables import (
    colocated_join,
    create_bucketed_database,
    write_bucketed_table,
)


@contextlib.contextmanager
def _db(spark, name):
    tmp = tempfile.mkdtemp(prefix=f"{name}_")
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
    create_bucketed_database(spark, name, tmp)
    try:
        yield name
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")
        shutil.rmtree(tmp, ignore_errors=True)


def _frames(spark):
    left = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 150).select(
        F.col("id").alias("rk"), (F.col("id") % 3).alias("b")
    )
    return left, right


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_plans_without_exchange(spark):
    left, right = _frames(spark)
    with _db(spark, "bt_ok") as db:
        write_bucketed_table(left, f"{db}.l", "k", 8)
        write_bucketed_table(right, f"{db}.r", "rk", 8)
        j = colocated_join(spark, f"{db}.l", f"{db}.r", "k", "rk")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        got = {(r["k"], r["a"], r["b"]) for r in j.collect()}
        want = {
            (r["k"], r["a"], r["b"])
            for r in left.join(
                right, left["k"] == right["rk"]
            ).collect()
        }
        assert got == want and len(got) == 150


def test_mismatched_bucket_counts_reshuffle(spark):
    """The contract the module docstring warns about: unequal bucket
    counts force at least one side back through an Exchange."""
    left, right = _frames(spark)
    with _db(spark, "bt_mis") as db:
        write_bucketed_table(left, f"{db}.l", "k", 8)
        write_bucketed_table(right, f"{db}.r", "rk", 4)
        plan = _plan(
            colocated_join(spark, f"{db}.l", f"{db}.r", "k", "rk")
        )
        assert "Exchange" in plan, plan


def test_path_read_bypasses_bucket_metadata(spark, tmp_path):
    """Reading the table's parquet files by PATH sees plain files —
    bucket metadata lives in the catalog, so the join re-shuffles.
    Pinned as the anti-pattern: readers must go through spark.table."""
    left, right = _frames(spark)
    with _db(spark, "bt_path") as db:
        write_bucketed_table(left, f"{db}.l", "k", 8)
        write_bucketed_table(right, f"{db}.r", "rk", 8)
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {db}.l")
            .filter("col_name = 'Location'")
            .collect()[0]["data_type"]
        )
        by_path = spark.read.parquet(loc)
        plan = _plan(
            by_path.join(
                spark.table(f"{db}.r").hint("merge"),
                by_path["k"] == F.col("rk"),
            )
        )
        assert "Exchange" in plan, plan


def test_point_lookup_prunes_buckets(spark):
    """With autoBucketedScan disabled, an equality filter on the bucket
    key scans exactly ONE bucket (SelectedBucketsCount: 1 out of N) —
    the point-lookup path a 100 TB keyed table needs."""
    left, _ = _frames(spark)
    prev = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    with _db(spark, "bt_prune") as db:
        write_bucketed_table(left, f"{db}.l", "k", 8)
        try:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "false",
            )
            f = spark.table(f"{db}.l").filter("k = 7")
            sel = re.findall(
                r"SelectedBucketsCount: (\d+) out of (\d+)", _plan(f)
            )
            assert sel == [("1", "8")], _plan(f)
            assert [r["a"] for r in f.collect()] == [0]
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                prev,
            )
