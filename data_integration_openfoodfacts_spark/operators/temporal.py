"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame operators
(option (a) of the custom-operator ladder — no Python boundary, fully
codegen-able), not UDFs.

As-of join — "for each left row, the latest right row with
``right.ts <= left.ts`` per key" — via the union trick:

  1. tag right rows 0, left rows 1;
  2. sort (key, ts, tag) in one window — a right row at the same ts
     sorts BEFORE the left row, making the match inclusive (<=);
  3. carry the last non-null right payload forward
     (``last(..., ignorenulls=True)`` over rows-unbounded-preceding);
  4. keep the left rows.

One shuffle on the key (same as the window dedup), no join explosion,
no skew beyond what the key distribution already has — this is the
standard scalable formulation (cf. pandas merge_asof semantics).

Range join — "left.value BETWEEN right.lo AND right.hi" — for a SMALL
band table a broadcast nested-loop is optimal and exact. For large band
tables, ``bucketize`` maps each band to covering fixed-width buckets so
the join becomes an equi-join on bucket + residual filter (the
interval-bucketing trick range-join optimizers use internally).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with ``right[on] <= left[on]``, matched per ``by`` key.

    ``right_cols`` are the right payload columns to carry (they appear
    NULL when no prior right row exists). Right rows should be unique
    per (by, on) — pre-dedup if not, or the carried payload among ties
    is the last under (on, input order), which is not deterministic.
    """
    by = list(by)
    lcols = [c for c in left.columns]
    # Join semantics for NULLs: a NULL timestamp or NULL key on the
    # right can never match (ASOF's `l.ts >= r.ts AND l.k = r.k` is
    # never true for NULL operands) — drop such right rows up front.
    right_clean = right.filter(F.col(on).isNotNull())
    for k in by:
        right_clean = right_clean.filter(F.col(k).isNotNull())

    # The carried payload is ONE struct per right row (not per-column):
    # last(ignorenulls) over per-column values would skip a legitimate
    # NULL field and resurrect a staler row's value — the whole-row
    # struct is non-null exactly when a right row exists, regardless of
    # its field values.
    payload = F.struct(
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        F.col(on).alias("__matched_ts"),
    )
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__src"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    r_tagged = right_clean.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    for c in lcols:
        if c not in by and c != on:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    u = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*[F.col(k) for k in by])
        .orderBy(F.col(on).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *lcols,
        "__src",
        F.last(
            F.when(F.col("__src") == 0, payload), ignorenulls=True
        )
        .over(w)
        .alias("__p"),
    )
    out = carried.filter(F.col("__src") == 1)
    matched = F.col("__p").isNotNull()
    if tolerance is not None:
        matched = matched & (
            (F.col(on) - F.col("__p.__matched_ts")) <= tolerance
        )
    return out.select(
        *lcols,
        *[
            F.when(matched, F.col(f"__p.{c}")).otherwise(F.lit(None)).alias(c)
            for c in right_cols
        ],
    )


def range_join_broadcast(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """value BETWEEN lo AND hi via broadcast nested-loop — exact and
    optimal while the band table is broadcastable (bands are inclusive
    of lo, exclusive of hi)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    return fact.join(F.broadcast(bands), cond, how)


def range_join_bucketed(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Scale path for LARGE band tables: explode each band over the
    fixed-width buckets it covers, equi-join on bucket, then apply the
    exact residual range predicate. Turns O(|fact|*|bands|) into a hash
    join; pick ``bucket_width`` near the median band width."""
    fact_b = fact.withColumn(
        "__bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    # Upper bucket = floor(hi/width) with no epsilon games: a value just
    # below hi can land in that bucket, and the exact residual filter
    # below removes anything >= hi, so over-covering by one bucket is
    # always safe while under-covering silently drops matches.
    bands_b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    return fact_b.join(bands_b, "__bucket").filter(cond).drop("__bucket")
