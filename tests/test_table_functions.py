"""Python UDTF + grouped-agg pandas UDAF (§2.11 completion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.functions.table_functions import (
    median_agg,
    register_table_functions,
)
from data_integration_openfoodfacts_spark.operators.chunking import (
    chunk_documents,
)


def test_udtf_matches_declarative_chunker(spark):
    register_table_functions(spark)
    df = spark.createDataFrame(
        [(1, "a" * 450), (2, "short"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.chunk_text, c.chunk_len "
        "FROM udtf_docs d, LATERAL chunk_text(d.text, 200, 150) c"
    )
    declarative = chunk_documents(df, "doc_id", "text", size=200, stride=150)
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in declarative.collect()}
    assert a == b
    # 450 chars -> 3 windows; short -> 1; empty -> 1; NULL -> 1 parity row
    assert len(a) == 3 + 1 + 1 + 1


def test_grouped_agg_median_matches_builtin(spark):
    register_table_functions(spark)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 9.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)],
        ["k", "v"],
    )
    ours = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(median_agg()("v").alias("m")).collect()
    }
    builtin = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(F.median("v").alias("m")).collect()
    }
    assert ours == builtin == {"a": 3.0, "b": 3.0}
    # SQL surface
    df.createOrReplaceTempView("udaf_t")
    sql = {
        r["k"]: r["m"]
        for r in spark.sql(
            "SELECT k, median_value(v) AS m FROM udaf_t GROUP BY k"
        ).collect()
    }
    assert sql == ours
