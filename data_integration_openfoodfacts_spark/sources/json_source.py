"""JSON-lines source/sink — the interchange format of most LLM-corpus
tooling (one document object per line).

Read contract mirrors the CSV source's philosophy: explicit schema
(schema-on-read, no inference job over 100 TB), PERMISSIVE mode with a
``_corrupt_record`` column so malformed lines are quarantined, not
fatal. JSONL is line-delimited, hence splittable — unlike
``multiLine=True`` JSON arrays, a single huge file still scans in
parallel.

The writer emits standard ``spark.write.json`` output (one line per
row), optionally gzip-compressed; at scale prefer zstd + many files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read line-delimited JSON with an explicit schema.

    Malformed lines surface in ``_corrupt_record`` (PERMISSIVE); by
    default they are dropped after the scan, with ``keep_corrupt=True``
    returning them for quarantine sinks.
    """
    if CORRUPT_COL not in schema.fieldNames():
        schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    df = spark.read.schema(schema).options(
        mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL
    ).json(path)
    if keep_corrupt:
        return df
    return df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write as JSON lines (one object per row), overwriting."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
