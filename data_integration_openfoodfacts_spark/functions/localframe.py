"""One-partition driver-literal DataFrames.

``spark.createDataFrame(rows, schema)`` on a Python list parallelizes
into ``sc.defaultParallelism`` Python-RDD partitions — 32 on this
harness — so EVERY downstream action forks/feeds 32 Python workers to
compute a handful of literal rows. Measured (round 12, root cause of
q194's oracle-budget bust): writing a 1-row audit frame cost 5.7s via
the default path vs 0.3s at one slice; even ``count()`` on the empty
fallback frames paid 0.8-1.8s per action.

Every local frame this engine builds is a bounded driver envelope —
audit rows, centroid tables, knob grids, learned merge tables, empty
store fallbacks — so ONE partition is always the right layout, and the
values are identical (same pickle serialization, same types; only the
slice count changes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``rows`` (list of tuples, possibly empty) + ``schema`` (DDL
    string or StructType) -> a single-partition DataFrame."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows if rows else [], 1), schema
    )
