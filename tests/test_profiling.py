"""Unit tests for operators.profiling.profile_table."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.operators.profiling import profile_table


def test_profile_table_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "b", None), (4, "a", 4.0)],
        "id int, s string, v double",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "v"}
    assert rows["id"].n_nulls == 0 and rows["id"].n_distinct == 4
    assert rows["id"].min_num == 1.0 and rows["id"].max_num == 4.0
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["s"].min_num is None
    assert rows["v"].n_nulls == 1 and rows["v"].max_num == 4.0


def test_profile_table_skips_complex_columns(spark):
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [3])], "id int, arr array<int>"
    )
    cols = [r["column"] for r in profile_table(df).collect()]
    assert cols == ["id"]


def test_profile_table_single_scan(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS x")
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ") <= 1


def test_profile_table_approx_close_to_exact(spark):
    df = spark.range(10_000).selectExpr("id", "id % 97 AS x")
    exact = {r["column"]: r.n_distinct for r in profile_table(df).collect()}
    approx = {
        r["column"]: r.n_distinct
        for r in profile_table(df, approx=True).collect()
    }
    for c in exact:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.1


def test_profile_table_excludes_interval_by_default(spark):
    df = spark.sql(
        "SELECT 1 AS id, INTERVAL '3' DAY AS gap"
    )
    rows = profile_table(df).collect()
    assert [r["column"] for r in rows] == ["id"]
    # explicit interval column profiles as string, not a cast crash
    rows2 = profile_table(df, ["gap"]).collect()
    assert rows2[0].n_nulls == 0 and rows2[0].min_str is not None


def test_profile_table_rejects_quoted_names(spark):
    import pytest as _pytest

    df = spark.range(3).withColumnRenamed("id", "a`b")
    with _pytest.raises(ValueError):
        profile_table(df)
