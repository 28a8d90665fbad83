"""Raw media ingestion: a directory of opaque files -> the engine's
multimodal binary-column shape.

Spark's built-in ``binaryFile`` format reads each file as one row
(path, modificationTime, length, content BINARY) with predicate
pushdown on the metadata columns and ``pathGlobFilter`` pruning at the
listing — the idiomatic lake-ingestion path for images/audio/video
blobs. ``load_media_dir`` normalizes that row into the (media_id,
media_type, payload, meta) schema the ``multimodal/binary_ops``
operators (decode, byte features, frame sampling) consume, so the whole
multimodal pipeline runs identically whether payloads arrive embedded
in parquet or as loose files.

Scale posture: one row per file with contents materialized — right for
media objects (KB-MB each); pair with ``maxFilesPerTrigger`` under
streaming or partitioned subdirs for very large drops. Never collect:
the content column stays executor-side through the pandas-UDF decode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> engine media_type tag (matches multimodal/binary_ops
#: fixtures; unknown extensions pass through as "bin")
_EXT_TYPES = {"jpg": "image", "jpeg": "image", "png": "image",
              "wav": "audio", "mp3": "audio", "mp4": "video"}


def load_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Read a directory of media files as (media_id, media_type,
    payload, meta) — the ``multimodal/binary_ops`` column contract.
    ``media_id`` is a stable md5 of the file path — deterministic
    across re-ingests of the same layout."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(os.fspath(path))
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    type_map = F.create_map(
        *[F.lit(x) for kv in _EXT_TYPES.items() for x in kv]
    )
    return raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("media_id"),
        F.coalesce(type_map[ext], F.lit("bin")).alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source_uri"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        ).alias("meta"),
    )
