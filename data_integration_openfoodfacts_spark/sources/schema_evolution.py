"""Schema evolution on read — conforming multi-generation parquet to a
target contract.

A corpus written over months drifts: new columns appear (a quality
score added in generation 3), old ones vanish, a type widens. At 100 TB
you cannot rewrite history to the newest schema; you read every
generation AS IS (`mergeSchema` unions the footers at planning time —
per-file schema reconciliation, no data pass) and CONFORM the union to
the target contract:

- missing columns materialize as typed NULLs (or a caller default) —
  a narrow per-row projection, no shuffle;
- extra columns are dropped (column pruning means they are never even
  read from disk once the projection lands);
- type drift is resolved by WIDENING ONLY (int→long, float→double,
  int/long→double, and same-type no-ops): a widening cast is total and
  engine-independent, while a narrowing or cross-family cast silently
  nulls or wraps somewhere in a 100 TB read — `conform_schema` REFUSES
  those loudly unless the caller opts into ``allow_lossy`` (which uses
  ``try_cast``: failures become NULLs, never wrapped values).

Scale posture: everything here is planning-time metadata work plus a
narrow select — the conformed read costs exactly what the raw read
costs. mergeSchema's footer union does scale with file COUNT, so
production stores should pin the contract in a catalog once it
stabilizes; this module is the on-read bridge until (and between)
those pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_evolving_parquet", "conform_schema", "schema_drift"]

#: total (lossless) widenings — anything else is lossy by policy.
_WIDENINGS = {
    ("integer", "long"),
    ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
}


def read_evolving_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Union-of-generations read: per-file footer schemas merged at
    planning time, columns absent from a generation read as NULL."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def schema_drift(df: DataFrame, target: T.StructType) -> dict:
    """What conforming would do: ``added`` (in target, not in df),
    ``dropped`` (in df, not in target), ``widened`` and ``lossy``
    (name-matched columns whose types differ, split by policy)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    want = {f.name: f.dataType for f in target.fields}
    added = sorted(set(want) - set(have))
    dropped = sorted(set(have) - set(want))
    widened, lossy = [], []
    for name in sorted(set(have) & set(want)):
        src, dst = have[name], want[name]
        if src == dst:
            continue
        pair = (src.typeName(), dst.typeName())
        (widened if pair in _WIDENINGS else lossy).append(
            (name, src.simpleString(), dst.simpleString())
        )
    return {
        "added": added, "dropped": dropped,
        "widened": widened, "lossy": lossy,
    }


def conform_schema(
    df: DataFrame,
    target: T.StructType,
    defaults: dict | None = None,
    allow_lossy: bool = False,
) -> DataFrame:
    """Project ``df`` onto exactly ``target``'s columns, in target
    order: missing columns become typed NULLs (or ``defaults[name]``,
    cast to the target type), extras are dropped, widening casts are
    applied, and lossy drift raises unless ``allow_lossy`` (then
    ``try_cast`` — failed casts NULL instead of wrapping)."""
    defaults = defaults or {}
    drift = schema_drift(df, target)
    if drift["lossy"] and not allow_lossy:
        detail = ", ".join(
            f"{n}: {s} -> {d}" for n, s, d in drift["lossy"]
        )
        raise ValueError(
            "lossy schema drift refused (pass allow_lossy=True to "
            f"try_cast with NULL-on-failure): {detail}"
        )
    have = {f.name: f.dataType for f in df.schema.fields}
    lossy_names = {n for n, _, _ in drift["lossy"]}
    cols = []
    for f in target.fields:
        if f.name not in have:
            base = (
                F.lit(defaults[f.name])
                if f.name in defaults
                else F.lit(None)
            )
            cols.append(base.cast(f.dataType).alias(f.name))
        elif have[f.name] == f.dataType:
            cols.append(F.col(f.name))
        elif f.name in lossy_names:
            cols.append(
                F.col(f.name).try_cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)
