"""Vector math over ``array<float>`` embedding columns.

All pure Column expressions built from higher-order functions
(``zip_with`` + ``aggregate``) — they run JVM-side inside codegen, no
Python boundary, so a brute-force similarity scan is shuffle-free and
scales with executors. Inputs are cast to double element-wise first so
accumulation happens in double precision (float32 accumulation drifts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_product_expr(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm_expr(a: Column | str) -> Column:
    return F.sqrt(dot_product_expr(a, a))


def cosine_similarity_expr(a: Column | str, b: Column | str) -> Column:
    # try_divide: an all-zeros vector (empty doc embedded, padding row)
    # yields NULL similarity instead of an ANSI DIVIDE_BY_ZERO abort.
    return F.try_divide(
        dot_product_expr(a, b), l2_norm_expr(a) * l2_norm_expr(b)
    )
