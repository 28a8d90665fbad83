"""Document chunking for LLM training: split each document into
fixed-size windows with configurable overlap (stride < size), the
pre-tokenization step of every context-window-bounded training
pipeline.

Pure narrow per-row work — ``sequence`` of window starts, ``transform``
to substrings, ``posexplode`` — no shuffle, no Python, scales linearly
with corpus bytes. Token-exact (BPE) chunking plugs into the same
shape by swapping the substring lambda for an Arrow-batched pandas UDF
that walks token offsets; the explode/schema plumbing stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """One row per (document, chunk): (id, chunk_id, chunk_text,
    chunk_len). Windows start every ``stride`` chars and span ``size``
    (overlap = size - stride); the final chunk may be shorter. An empty
    document yields one empty chunk (chunk_id 0) so no document
    silently disappears from the chunked corpus.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    c = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: c.substr(s, F.lit(size)))
    return (
        df.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
            F.length("chunk_text").cast("long").alias("chunk_len"),
        )
    )
