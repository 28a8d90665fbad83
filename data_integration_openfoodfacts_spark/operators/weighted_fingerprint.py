"""Term-frequency-weighted SimHash — the weighted-feature fingerprint
(Charikar 2002, as deployed in Manku et al.'s web-crawl dedup): each
token votes on every bit with weight = its in-document count, so a
document dominated by one repeated phrase fingerprints by that phrase
instead of giving its one-off tokens equal say. The unweighted q20
SimHash (`similarity_dedup.simhash`) treats {"spam spam spam ham"} and
{"spam ham"} identically; the weighted form separates them — the
signal that matters for templated/boilerplate-heavy near-dups.

All-integer: weights are exact token counts, votes are ±tf sums, a bit
is set iff its vote sum is strictly positive (ties -> 0, the q20
convention) — every engine replays the fingerprint bit-for-bit.

Scale shape: one groupBy(id, token) count (map-side combined — the
token explode never shuffles raw rows twice), a narrow per-bit explode
of BITS rows per distinct (id, token), and two grouped sums keyed on
the id. Linear in corpus tokens, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import md5_long


def tf_weighted_simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16
) -> DataFrame:
    """(id, simhash long) — SimHash with per-token tf weights over
    whitespace tokens (empty tokens from repeated spaces dropped, the
    engine's tokenizer convention)."""
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hashed = tf.withColumn("h", md5_long(F.col("tok")) % (2 ** bits))
    bit = F.explode(F.array(*[F.lit(b) for b in range(bits)])).alias("bit")
    votes = hashed.select(F.col(id_col), "h", "tf", bit).withColumn(
        "vote", (F.expr("(h >> bit) & 1") * 2 - 1) * F.col("tf")
    )
    bitsum = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("simhash")
    )
