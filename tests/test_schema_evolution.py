"""Schema evolution on read (`sources/schema_evolution.py`):
mergeSchema generation union, conformance projection semantics
(typed-NULL backfill, defaults, widening, extra-column drop), the
lossy-drift refusal policy, and try_cast's NULL-on-failure opt-in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_integration_openfoodfacts_spark.sources.schema_evolution import (
    conform_schema,
    read_evolving_parquet,
    schema_drift,
)

TARGET = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("tag", T.StringType()),
])


def test_merge_read_and_conform(spark, tmp_path):
    """Two generations — one missing v, one with v as int plus a stray
    column — conform to one contract: NULL backfill, int->long widen,
    stray dropped, column order = target order."""
    store = str(tmp_path / "store")
    spark.createDataFrame([(1, "a")], "k long, tag string").write.parquet(
        f"{store}/gen=1"
    )
    spark.createDataFrame(
        [(2, 20, "b", 9)], "k long, v int, tag string, stray int"
    ).write.parquet(f"{store}/gen=2")
    merged = read_evolving_parquet(spark, store)
    drift = schema_drift(merged, TARGET)
    assert drift["added"] == [] and sorted(drift["dropped"]) == [
        "gen", "stray"
    ]
    assert drift["widened"] == [("v", "int", "bigint")]
    out = conform_schema(merged, TARGET)
    assert [f.name for f in out.schema.fields] == ["k", "v", "tag"]
    assert out.schema["v"].dataType == T.LongType()
    rows = {r["k"]: (r["v"], r["tag"]) for r in out.collect()}
    assert rows == {1: (None, "a"), 2: (20, "b")}


def test_missing_column_default(spark):
    df = spark.createDataFrame([(1,)], "k long")
    out = conform_schema(
        df, TARGET, defaults={"v": 7, "tag": "legacy"}
    )
    r = out.collect()[0]
    assert (r["v"], r["tag"]) == (7, "legacy")
    assert out.schema["v"].dataType == T.LongType()


def test_lossy_drift_refused_then_opt_in(spark):
    """long->int narrowing refuses by default; with allow_lossy, values
    out of int range become NULL (try_cast), never wrapped."""
    df = spark.createDataFrame(
        [(1, 5), (2, 2**40)], "k long, v long"
    )
    narrow = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.IntegerType()),
    ])
    with pytest.raises(ValueError, match="lossy schema drift"):
        conform_schema(df, narrow)
    out = conform_schema(df, narrow, allow_lossy=True)
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {1: 5, 2: None}


def test_cross_family_is_lossy_not_widening(spark):
    """string->long is cross-family: refused by default even though a
    cast exists, and NULL-on-unparseable under allow_lossy."""
    df = spark.createDataFrame(
        [("1", "42"), ("2", "oops")], "k string, v string"
    )
    want = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    drift = schema_drift(df, want)
    assert drift["lossy"] == [("v", "string", "bigint")]
    with pytest.raises(ValueError, match="v: string -> bigint"):
        conform_schema(df, want)
    rows = {
        r["k"]: r["v"]
        for r in conform_schema(df, want, allow_lossy=True).collect()
    }
    assert rows == {"1": 42, "2": None}


def test_merged_read_still_prunes_columns(spark, tmp_path):
    """Schema merging must not break column pruning at the scan (the
    pre-conformance pin this file has carried since the parquet-layer
    tests: ReadSchema holds only the selected columns)."""
    path = str(tmp_path / "lake2")
    spark.range(100).selectExpr(
        "id", "id*2 AS a", "id*3 AS b"
    ).write.parquet(f"{path}/gen=1")
    spark.range(100, 200).selectExpr(
        "id", "id*2 AS a", "id*3 AS b", "id*4 AS c"
    ).write.parquet(f"{path}/gen=2")
    df = read_evolving_parquet(spark, path).select("id", "c")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "a:" not in read_schema and "b:" not in read_schema
    assert "c:" in read_schema
    assert df.count() == 200


def test_conformed_read_still_prunes_and_pushes(spark, tmp_path):
    """Conformance is a projection: a filter over the conformed frame
    still reaches the parquet scan as a pushed filter."""
    store = str(tmp_path / "store")
    spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("int").alias("v"),
        F.lit("x").alias("tag"),
    ).write.parquet(f"{store}/gen=1")
    out = conform_schema(
        read_evolving_parquet(spark, store), TARGET
    ).filter(F.col("k") == 7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,7)]" in plan, plan
