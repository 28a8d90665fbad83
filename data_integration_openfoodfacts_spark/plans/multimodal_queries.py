"""Multimodal plumbing exposed to the correctness gate.

The documents table stands in for a media corpus: payload = utf-8 bytes
of the text. The byte-histogram feature extraction (Arrow-batched pandas
UDF over binary) is verified bucket-by-bucket against a pure-SQL DuckDB
oracle — scalar doubles, single IEEE division each, so exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary_ops import attach_fake_media, extract_byte_features
from ..sources.parquet_source import load_table


def q29_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ascii-only + non-empty filter on BOTH sides: the engine histograms
    # UTF-8 BYTES, the SQL oracle can only see characters — they
    # coincide exactly on ascii text; and an empty payload has no
    # defined histogram (the engine emits all-zeros, DuckDB's
    # string_split('','') would yield [''] with ascii('')=0 -> a fake
    # bucket-0 of 1.0). Pin both preconditions in the query rather than
    # trusting the fixture to stay ascii and non-empty forever.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[\\x00-\\x7F]*$") & (F.col("text") != "")
    )
    media = attach_fake_media(docs, "doc_id", "text")
    feats = extract_byte_features(media, n_buckets=8)
    return feats.select(
        "media_id",
        F.posexplode("byte_histogram").alias("bucket", "fraction"),
    ).select(
        "media_id", F.col("bucket").cast("long").alias("bucket"), "fraction"
    )


Q29_ORACLE = """
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]') AND text <> ''
),
chars AS (
  SELECT doc_id AS media_id, ascii(u.c) AS code
  FROM ascii_docs, LATERAL (SELECT UNNEST(string_split(text, '')) AS c) u
),
sizes AS (SELECT media_id, COUNT(*) AS n FROM chars GROUP BY 1),
counts AS (SELECT media_id, code // 32 AS bucket, COUNT(*) AS c FROM chars GROUP BY 1, 2),
grid AS (
  SELECT s.media_id, b.bucket, s.n
  FROM sizes s, LATERAL (SELECT UNNEST(range(0, 8)) AS bucket) b
)
SELECT g.media_id, CAST(g.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(c.c, 0) AS DOUBLE) / g.n AS fraction
FROM grid g
LEFT JOIN counts c ON c.media_id = g.media_id AND c.bucket = g.bucket
"""

MULTIMODAL_QUERIES = {"q29_byte_histogram": q29_byte_histogram}
MULTIMODAL_ORACLES = {"q29_byte_histogram": Q29_ORACLE}
