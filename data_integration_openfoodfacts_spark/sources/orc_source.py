"""ORC source/sink — the second columnar interchange format Spark
ships natively (Hive-ecosystem counterpart of Parquet).

Same scan contract as the parquet source: predicate pushdown and
column pruning reach the reader (ORC carries min/max + Bloom filter
indexes per stripe), and an explicit schema skips inference. Exists so
a warehouse whose upstream lands ORC (classic Hive/Hadoop estates) can
feed the same pipelines without a conversion hop; steady-state storage
here remains Parquet (TESTDATA.md tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC scan. Pass ``schema`` to pin types (and enable dropping
    columns the files may lack — missing columns read as NULL with
    the default ORC reader when the schema is explicit)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink, overwriting. zstd default (ORC's zlib default is
    slower at comparable ratios on modern CPUs)."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
