"""Python UDTF + grouped-agg pandas UDAF — the §2.11 API tiers beyond
scalar UDFs.

The engine already exercises scalar pandas UDFs (ascii_fold), grouped
map (``applyInPandas`` EWMA), map-partitions (``mapInPandas``
multimodal), and stateful (``applyInPandasWithState``). This module
completes the surface with:

- ``ChunkTextUDTF`` — a Python **UDTF** (Spark 4 ``@udtf``): one input
  row fans out to N chunk rows from inside the FROM clause / a lateral
  join. Semantics mirror ``operators/chunking.chunk_documents`` (the
  declarative sequence/transform/posexplode formulation, which remains
  the scale path — the UDTF crosses the Python boundary per row and
  exists for parity of mechanism, pinned equivalent by test).
- ``median_agg`` — a **grouped-agg pandas UDF** (vectorized UDAF): the
  whole group's column arrives as one Arrow batch and reduces to a
  scalar. Median is order-independent and deterministic, so it is
  equivalence-tested against the built-in ``F.median``.

Both are registered for the SQL surface by ``register_table_functions``.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="chunk_id: bigint, chunk_text: string, chunk_len: bigint")
class ChunkTextUDTF:
    """Fixed-window chunker with overlap: windows start every
    ``stride`` chars, span ``size``; the final chunk may be shorter; an
    empty document yields one empty chunk (chunk_id 0) so no document
    silently disappears."""

    def eval(self, text: str, size: int = 200, stride: int = 150):
        if size is None or stride is None or size <= 0 or stride <= 0:
            raise ValueError("size and stride must be positive")
        if text is None:
            # parity with chunk_documents: substr/length of NULL are
            # NULL, one chunk row survives via greatest(length, 1)
            yield 0, None, None
            return
        starts = range(0, max(len(text), 1), stride)
        for i, s in enumerate(starts):
            chunk = text[s : s + size]
            yield i, chunk, len(chunk)


@lru_cache(maxsize=1)
def median_agg():
    """Exact per-group median as a vectorized UDAF (grouped-agg pandas
    UDF). Deterministic: the median is independent of the Arrow batch
    row order, unlike e.g. a float sum. Factory (not module-level
    decoration) because ``pandas_udf`` resolves its return type against
    the ACTIVE session — importing this module must not require one."""

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        m = v.median()
        return float(m) if m == m else None  # NaN -> NULL

    return _median


def register_table_functions(spark: SparkSession) -> None:
    """Expose the UDTF/UDAF to Spark SQL:

        SELECT d.doc_id, c.* FROM documents d,
               LATERAL chunk_text(d.text, 200, 150) c
        SELECT event_type, median_value(value) FROM events GROUP BY 1
    """
    spark.udtf.register("chunk_text", ChunkTextUDTF)
    spark.udf.register("median_value", median_agg())
