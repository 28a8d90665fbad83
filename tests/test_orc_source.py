"""ORC source: exact round trip + partitioned layout + pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.sources.orc_source import (
    read_orc,
    write_orc,
)
from tests.conftest import SF_DIR


def test_orc_round_trip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_orc_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_orc_by_lang")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    one = back.filter(F.col("lang") == "en")
    # partition pruning: the lang=en filter must reach the scan as a
    # partition filter, not a post-scan predicate
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    expected = docs.filter(F.col("lang") == "en").count()
    assert one.count() == expected


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_orc_plain")
    write_orc(docs, path)
    q = read_orc(spark, path).filter(F.col("n_chars") > 100).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pushdown + pruning hit the ORC reader exactly like parquet
    assert "PushedFilters: [" in plan and "n_chars" in plan
    assert "ReadSchema: struct<doc_id:bigint,n_chars:bigint>" in plan
