"""Parquet table source for the test star schema.

The driver's synthetic tables (TESTDATA.md) are one parquet file per
table. At 100 TB each "file" becomes a partitioned parquet/Delta
directory; ``spark.read.parquet`` handles both transparently, and the
scan benefits from column pruning + predicate pushdown (filters appear
as ``PushedFilters`` in ``.explain``), so all engine operators are
written against these loaders rather than raw paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The testdata timestamps are timezone-naive; date/calendar functions
    # resolve through the session timezone, so a non-UTC caller session
    # would silently shift dates (SURVEY.md §7 "Timezone-sensitive date
    # math"). Pin UTC — runtime-settable, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # Spark reader rejects; read the raw int64 nanos as long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` as a proper TimestampType (microsecond
    precision, nanos truncated — matches every micro-precision engine,
    e.g. the DuckDB oracle) plus the raw nanos in ``ts_ns``."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        F.col("ts").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` plans work."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

