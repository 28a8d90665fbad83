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

def q171_binary_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free near-dup fingerprints for binary payloads
    (`multimodal/binary_ops.binary_simhash`): SimHash over distinct
    byte 4-grams of the opaque payload — catches re-crawled media that
    differ by a few bytes without any decoder. Fake-media payloads are
    the docs' utf-8 bytes (q29's fixture), ascii-filtered so DuckDB —
    which can only n-gram CHARACTERS — sees the identical byte stream
    through `hex()` (verified byte-identical to `F.hex`). Payloads
    shorter than 4 bytes carry no gram and drop out on both sides."""
    from ..multimodal.binary_ops import attach_fake_media, binary_simhash

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").rlike("^[\\x00-\\x7F]*$") & (F.col("text") != "")
    )
    media = attach_fake_media(docs, "doc_id", "text")
    return binary_simhash(media, "media_id", "payload", ngram_bytes=4,
                          bits=16)


Q171_ORACLE = """
WITH ascii_docs AS (
  SELECT doc_id, text FROM documents
  WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]') AND text <> ''
),
hx AS (
  SELECT doc_id AS media_id, hex(text) AS h, length(text) AS nb
  FROM ascii_docs WHERE length(text) >= 4
),
grams AS (
  SELECT DISTINCT media_id, substring(h, i * 2 + 1, 8) AS gram
  FROM hx, LATERAL (SELECT UNNEST(range(0, nb - 3)) AS i) u
),
gh AS (
  SELECT media_id,
         CAST(concat('0x', substring(md5(gram), 1, 15)) AS BIGINT)
           % 65536 AS h16
  FROM grams
),
votes AS (
  SELECT media_id, b, SUM(((h16 >> b) & 1) * 2 - 1) AS s
  FROM gh, LATERAL (SELECT UNNEST(range(0, 16)) AS b) v
  GROUP BY media_id, b
)
SELECT media_id,
       CAST(SUM(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS BIGINT)
         AS simhash
FROM votes GROUP BY media_id
"""


MULTIMODAL_QUERIES = {
    "q29_byte_histogram": q29_byte_histogram,
    "q171_binary_simhash": q171_binary_simhash,
}
MULTIMODAL_ORACLES = {
    "q29_byte_histogram": Q29_ORACLE,
    "q171_binary_simhash": Q171_ORACLE,
}
