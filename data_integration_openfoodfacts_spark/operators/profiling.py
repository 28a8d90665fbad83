"""Single-pass table profiling (the Deequ / dbt-profiler surface).

``profile_table`` computes per-column null counts, exact distinct
counts, and typed min/max for any DataFrame in ONE wide aggregation +
a ``stack`` unpivot — one scan regardless of how many columns are
profiled. Numeric and string extrema are tracked in separate typed
columns so doubles never round-trip through engine-specific string
formatting (the q118 oracle-parity rule).

Scale: the wide agg is a single global aggregate — every metric is
partially computed map-side; COUNT(DISTINCT) columns are expanded by
Catalyst into one `expand` over the same scan (still one pass over the
data, shuffle keyed by the expand id). Output is |columns| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtype-string prefixes treated as numeric. NOTE: "interval day"
#: etc. must NOT match — matched against "int"/"integer" exactly and
#: the others by prefix (decimal(10,2) carries parameters).
_NUMERIC_EXACT = {"int", "integer", "bigint", "smallint", "tinyint"}
_NUMERIC_PREFIXES = ("float", "double", "decimal")


def _is_numeric(dtype: str) -> bool:
    return dtype in _NUMERIC_EXACT or dtype.startswith(_NUMERIC_PREFIXES)


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) of ``df``.

    Returns one row per column: ``(column, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str)`` — numeric extrema as DOUBLE
    for numeric columns, string extrema for everything else (cast to
    string for dates/timestamps/booleans).

    ``approx=True`` swaps the exact COUNT(DISTINCT) for HLL++
    ``approx_count_distinct`` — at 100 TB the exact form funnels every
    distinct value of every column through one final reducer, while
    the sketch is fixed-size mergeable state that partial-aggregates
    map-side (same trade q100/q102 pin with error-bound oracles).
    The DuckDB-oracle-gated q118 uses the exact form at test scale.
    """
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [
            c
            for c, t in df.dtypes
            if not t.startswith(("array", "map", "struct", "binary", "interval"))
        ]
    bad = [c for c in cols if "`" in c or "'" in c]
    if bad:
        raise ValueError(
            f"profile_table: column names with quotes/backticks are not "
            f"supported (rename first): {bad}"
        )
    kinds = {c: "num" if _is_numeric(dtypes[c]) else "str" for c in cols}
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls")
        )
        aggs.append(
            (
                F.approx_count_distinct(c)
                if approx
                else F.countDistinct(c)
            ).alias(f"{c}__distinct")
        )
        if kinds[c] == "num":
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min_num"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max_num"))
        else:
            aggs.append(
                F.min(F.col(c).cast("string")).alias(f"{c}__min_str")
            )
            aggs.append(
                F.max(F.col(c).cast("string")).alias(f"{c}__max_str")
            )
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        mn_num = f"`{c}__min_num`" if kinds[c] == "num" else "CAST(NULL AS DOUBLE)"
        mx_num = f"`{c}__max_num`" if kinds[c] == "num" else "CAST(NULL AS DOUBLE)"
        mn_str = f"`{c}__min_str`" if kinds[c] == "str" else "CAST(NULL AS STRING)"
        mx_str = f"`{c}__max_str`" if kinds[c] == "str" else "CAST(NULL AS STRING)"
        stack_args.append(
            f"'{c}', `{c}__nulls`, `{c}__distinct`, "
            f"{mn_num}, {mx_num}, {mn_str}, {mx_str}"
        )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        )
    )
