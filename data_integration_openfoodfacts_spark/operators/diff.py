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


#: prime modulus for the checksum's second moment (< 2^30 so the
#: square stays within BIGINT range in every engine)
_CK_P = 1073741789


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent whole-table content checksum: one row with
    (n_rows, checksum, checksum_sq) — the exact decimal sums of the
    60-bit md5 row hash and of its squared residue mod a prime. One
    scan, one map-side-combined aggregate, a fixed-size answer: the
    cheap cross-environment migration check with no data movement.

    Collision honesty: equal row multisets => equal outputs, but the
    converse is NOT an iff. An additive checksum can collide without
    any md5 collision (hash multisets {1,4} vs {2,3} share a sum);
    matching the second moment too forces both the sum and the sum of
    squares to agree, which random or accidental divergence
    essentially never does — but a determined adversary still could.
    Treat equality as very strong evidence, not proof.

    Same float caveat as :func:`row_fingerprint` — quantize doubles
    before checksumming across engines."""
    fp60 = F.conv(
        F.substring(row_fingerprint(cols), 1, 15), 16, 10
    ).cast("long")
    res = fp60 % F.lit(_CK_P)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(fp60.cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum"),
        F.sum((res * res).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum_sq"),
    )
