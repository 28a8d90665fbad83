"""Keyed table diff — reconcile two snapshots of the same table.

The data-integration primitive behind regression-checking a pipeline
change, auditing a backfill, or validating a migration: given OLD and
NEW versions keyed the same way, label every key ``added`` /
``removed`` / ``changed`` / ``same``.

Scale posture: each side collapses to (key, fingerprint) — a narrow
projection — and the diff is ONE full-outer hash join on the key
(two shuffles total, each proportional to its own side; no broadcast
assumption, either side may be 100 TB). Fingerprints are md5 over the
compared columns, so "changed" detection moves bytes-of-row → 16
bytes through the shuffle.

NULL discipline: every compared column passes through
``coalesce(cast(c AS string), sentinel)`` before hashing — concat_ws
silently DROPS nulls in both Spark and DuckDB, which would make
(NULL, "x") collide with ("x", NULL). The sentinel keeps NULL distinct
from empty string and any real value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "\x00<null>"
_SEP = "\x1f"


def row_fingerprint(cols: list[str]) -> F.Column:
    """md5 fingerprint over ``cols`` with NULL-safe canonicalization.
    Callers hashing float columns should quantize them first (engine
    string formatting of doubles differs; ints/strings/dates are
    stable)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Full-outer keyed diff. Returns one row per key present in either
    side: (*keys, status) with status in added | removed | changed |
    same — ``added`` means present only in NEW."""
    o = old.select(
        *[F.col(k) for k in keys], row_fingerprint(compare_cols).alias("__fp_old")
    )
    n = new.select(
        *[F.col(k) for k in keys], row_fingerprint(compare_cols).alias("__fp_new")
    )
    return (
        o.join(n, keys, "full_outer")
        .select(
            *keys,
            F.when(F.col("__fp_old").isNull(), F.lit("added"))
            .when(F.col("__fp_new").isNull(), F.lit("removed"))
            .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
            .otherwise(F.lit("same"))
            .alias("status"),
        )
    )
