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

from .similarity_dedup import md5_long


def split_bucket(id_col: Column | str, salt: str = "", buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of (salt || id).

    Reuses :func:`md5_long` — the single engine-parity-critical
    md5->long expression whose DuckDB twin Q48_ORACLE embeds."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_long(F.concat(F.lit(salt), c.cast("string"))) % buckets


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
    if train_pct <= 0 or val_pct < 0 or train_pct + val_pct > 100:
        raise ValueError(
            "need train_pct > 0, val_pct >= 0, train_pct + val_pct <= 100 "
            f"(got train_pct={train_pct}, val_pct={val_pct})"
        )
    b = split_bucket(id_col, salt=salt)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )
