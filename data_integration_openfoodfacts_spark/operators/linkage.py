"""Blocked fuzzy record linkage — entity resolution for a
data-integration engine.

The classic two-phase pattern: a cheap deterministic BLOCK key bounds
the quadratic candidate scan to block-local work (exactly how LSH bands
bound the shingle scan), then an edit-distance verify runs per
candidate pair, JVM-side (`levenshtein` is a built-in in both Spark
and DuckDB, so oracle parity is exact integer equality).

Skew: a degenerate block (e.g. every record named "UNKNOWN 0") yields
m²/2 pairs from one task — ``max_block_size`` drops such blocks from
pair generation, the same contract as the LSH bucket cap: bounded work
at the cost of recall only inside pathological blocks, which a linkage
pipeline routes to a dedicated clerical-review path instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_distance: int = 4,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs within a block at Levenshtein distance <=
    ``max_distance``. Columns: key_a, key_b, distance (key_a < key_b).
    """
    base = df.select(
        F.col(id_col).alias("key"),
        F.col(name_col).alias("name"),
        block_expr.alias("block"),
    )
    if max_block_size is not None:
        ok = (
            base.groupBy("block")
            .agg(F.count(F.lit(1)).alias("m"))
            .filter(F.col("m") <= max_block_size)
            .select("block")
        )
        base = base.join(ok, "block", "left_semi")
    a = base.select(
        F.col("key").alias("key_a"), F.col("name").alias("name_a"), "block"
    )
    b = base.select(
        F.col("key").alias("key_b"), F.col("name").alias("name_b"), "block"
    )
    return (
        a.join(b, "block")
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )
