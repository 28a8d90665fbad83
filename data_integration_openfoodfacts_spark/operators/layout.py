"""Physical layout optimization: Z-order (Morton) clustering for
multi-dimensional data skipping.

A 100 TB table filtered on TWO columns can only skip row groups on the
column it is sorted by — a linear sort leaves the other column's
min/max spans as wide as the table. Interleaving the bits of each
column's rank buckets (the Morton curve) and range-sorting by that
Z-value tightens parquet row-group min/max statistics on EVERY
interleaved dimension at once (2+ columns, k*bits <= 62), so predicate pushdown skips files for
filters on any of them (the Delta/Iceberg `OPTIMIZE ZORDER BY`
technique, built here from plain Spark primitives).

Implementation notes:
- Per-column buckets are equi-width over the column's [min, max]
  (one tiny driver-side stats action at write time — a layout utility,
  not a query operator) applied with `width_bucket` (JVM expression,
  no UDF). Heavily skewed columns should be pre-transformed (e.g.
  log) before z-ordering — same caveat Delta's OPTIMIZE carries.
- The bit interleave is a fixed unrolled expression of shifts/ORs —
  whole-stage-codegen friendly, no Python in the hot path.
- The final ordering uses `repartitionByRange` + `sortWithinPartitions`
  (range exchange + local sort), NOT a global `orderBy` — same
  clustering, no single-reducer bottleneck.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (2 dims -> 16-bit Z-values; 256 buckets per
#: dimension is plenty to separate row groups)
_BITS = 8


def _nan_safe(c: Column) -> Column:
    """NULL out NaNs so min/max stats and bucketing ignore them (a
    single NaN would otherwise become max() and collapse every value
    into the top bucket, silently destroying the clustering)."""
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def _bucketize(col: str, lo, hi, bits: int) -> Column:
    """Equi-width bucket in [0, 2^bits) for ``col`` over the observed
    [lo, hi] (NULLs and NaNs map to bucket 0 so they cluster
    together)."""
    n = 2**bits
    c = _nan_safe(F.col(col).cast("double"))
    if lo is None or hi is None or lo == hi:
        return F.lit(0).cast("long")
    # width_bucket returns 1..n in-range and n+1 at x == hi; shift to
    # 0-based and clamp.
    return (
        F.when(c.isNull(), F.lit(0))
        .otherwise(
            F.least(
                F.width_bucket(c, F.lit(lo), F.lit(hi), F.lit(n)),
                F.lit(n),
            )
            - 1
        )
        .cast("long")
    )


def _interleave(buckets: list[Column], bits: int = _BITS) -> Column:
    """Morton-interleave k ``bits``-wide bucket ids round-robin: bit i
    of dimension j lands at position i*k + j. k*bits must fit a long
    (<= 62)."""
    k = len(buckets)
    if k * bits > 62:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} z-bits exceeds a long"
        )
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * k + j))
    return reduce(lambda x, y: x.bitwiseOR(y), terms)


def zorder_value(df: DataFrame, cols: list[str], bits: int = _BITS) -> Column:
    """Z-value column for ``cols`` (2+ dimensions). Column stats for
    every dimension come from ONE combined aggregate — a single stats
    scan, not one per column."""
    if len(cols) < 2:
        raise ValueError("zorder_value needs at least 2 columns")
    if len(cols) * bits > 62:
        # checkable from the arguments alone — fail BEFORE launching
        # the (potentially 100 TB) stats scan
        raise ValueError(
            f"{len(cols)} dims x {bits} bits = {len(cols) * bits} "
            "z-bits exceeds a long"
        )
    stats = df.agg(
        *[
            agg(_nan_safe(F.col(c).cast("double"))).alias(f"{which}_{i}")
            for i, c in enumerate(cols)
            for which, agg in (("lo", F.min), ("hi", F.max))
        ]
    ).first()
    buckets = [
        _bucketize(c, stats[f"lo_{i}"], stats[f"hi_{i}"], bits)
        for i, c in enumerate(cols)
    ]
    return _interleave(buckets, bits)


def zorder_by(
    df: DataFrame, cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` clustered on the Z-order curve of ``cols``, ready
    to write. Downstream parquet row groups get tight min/max spans on
    BOTH columns — filters on either dimension skip most groups."""
    z = zorder_value(df, cols)
    out = df.withColumn("__z", z)
    n = num_partitions or out.rdd.getNumPartitions()
    return (
        out.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
