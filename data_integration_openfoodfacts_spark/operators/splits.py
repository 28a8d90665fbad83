"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is partition-layout dependent (re-runs and repartitions
reassign rows), which silently leaks val/test into train across
pipeline versions. The standard fix — hash the stable document id into
buckets — is fully deterministic, re-run-safe, and embarrassingly
parallel (a narrow per-row expression, no shuffle, no RNG state).

The hash is md5-derived (engine-neutral, like every hash in this
engine) so split assignment reproduces bit-exactly in any system that
can compute md5 — including the DuckDB oracle and any downstream
Python/SQL consumer auditing the split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col: Column | str, salt: str = "", buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of (salt || id)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(F.lit(salt), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % buckets
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Assign each row a stable train/val/test split by hashed id.

    Percentages are integer bucket counts out of 100; test gets the
    remainder. Adds ``bucket`` (0-99) and ``split`` columns.
    """
    if not 0 < train_pct + val_pct <= 100:
        raise ValueError("train_pct + val_pct must be in (0, 100]")
    b = split_bucket(id_col, salt=salt)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )
