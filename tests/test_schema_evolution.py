"""Schema evolution across writer versions: a 100 TB lake always
contains files written by different pipeline versions. The engine's
read path must unify drifted schemas (new columns NULL-backfilled for
old files) and the Silver builder already tolerates missing source
columns (P1 drift probe) — this pins the parquet layer itself."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_unifies_writer_generations(spark, tmp_path):
    path = str(tmp_path / "lake")
    v1 = spark.range(5).select(
        F.col("id"), F.lit("a").alias("source")
    )
    v2 = spark.range(5, 10).select(
        F.col("id"),
        F.lit("b").alias("source"),
        (F.col("id") * 1.5).alias("quality"),  # column added in v2
    )
    v1.write.parquet(f"{path}/gen=1")
    v2.write.parquet(f"{path}/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    assert set(df.columns) == {"id", "source", "quality"}
    rows = {r.id: r for r in df.collect()}
    assert rows[0].quality is None, "old files NULL-backfill new columns"
    assert rows[7].quality == 10.5


def test_merged_read_still_prunes_columns(spark, tmp_path):
    """Schema merging must not break column pruning at the scan."""
    path = str(tmp_path / "lake2")
    spark.range(100).selectExpr("id", "id*2 AS a", "id*3 AS b").write.parquet(
        f"{path}/gen=1"
    )
    spark.range(100, 200).selectExpr(
        "id", "id*2 AS a", "id*3 AS b", "id*4 AS c"
    ).write.parquet(f"{path}/gen=2")
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{path}/gen=1", f"{path}/gen=2")
        .select("id", "c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "a:" not in read_schema and "b:" not in read_schema
    assert "c:" in read_schema
    assert df.count() == 200
