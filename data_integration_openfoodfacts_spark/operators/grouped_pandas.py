"""Grouped-map pandas operators (``applyInPandas``) — the escape hatch
for per-group algorithms that Spark's window functions cannot express
(recursive accumulators, iterative fits).

EWMA is the canonical example: ``acc_{i} = acc_{i-1} + alpha * (x_i -
acc_{i-1})`` is a recursive aggregate — SQL window functions have no
recursion, so the choices are a quadratic self-join or a per-group fold.
``applyInPandas`` ships each key group to Python as one Arrow batch and
folds it vectorizable-adjacent; one shuffle on the key, state bounded by
the largest single group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def grouped_ewma(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Final exponentially-weighted moving average of ``value_col`` per
    key, folding rows in ``order_cols`` order. Returns (key, n_rows,
    ewma). ``order_cols`` must be a total order within each key for a
    deterministic result."""
    out_schema = StructType(
        [
            StructField(key_col, df.schema[key_col].dataType),
            StructField("n_rows", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    order_list = list(order_cols)

    def fold_group(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values(order_list, kind="mergesort")
        acc = None
        for x in pdf[value_col]:
            # skip-null semantics: Arrow delivers NULL doubles as NaN,
            # and one NaN would otherwise poison the accumulator forever
            if x is None or (isinstance(x, float) and math.isnan(x)):
                continue
            x = float(x)
            acc = x if acc is None else acc + alpha * (x - acc)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_rows": [len(pdf)],
                "ewma": [acc],
            }
        )

    return df.groupBy(key_col).applyInPandas(fold_group, out_schema)
