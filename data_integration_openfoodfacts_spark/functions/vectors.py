"""Vector math over ``array<float>`` embedding columns.

Two tiers with IDENTICAL numerics:

- Pure Column expressions built from higher-order functions
  (``zip_with`` + ``aggregate``) — JVM-side, no Python boundary. Right
  for per-vector work (norms, one-query scans): n folds total.
- ``pair_dot_fold`` — an Arrow-batched pandas UDF for PAIR-scoring hot
  paths (near-dup verify joins), where the fold runs once per candidate
  pair (~n² candidates). Spark evaluates higher-order-function lambdas
  interpreted per element (they are opaque to whole-stage codegen), so
  at millions of pairs the HOF fold is the bottleneck; the UDF does the
  same arithmetic as one vectorized numpy pass.

Both tiers accumulate left-to-right in double precision:
``np.cumsum`` applies IEEE rounding sequentially per element, which is
bit-identical to the HOF fold and to DuckDB's ``list_reduce`` — so
either tier hash-matches the oracle (pinned by
tests/test_llm_ops.py::test_pair_dot_fold_bitexact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


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


# DoubleType() (not the DDL string "double"): the string form parses
# via the active SparkContext, which breaks importing this module
# before a session exists.
@pandas_udf(DoubleType())
def pair_dot_fold(a: pd.Series, b: pd.Series) -> pd.Series:
    """Left-to-right-fold dot product, vectorized over an Arrow batch.

    Numerically identical to ``dot_product_expr`` (and to the DuckDB
    oracle's ``list_reduce``): elements are cast float->double (exact)
    and accumulated strictly left-to-right via ``np.cumsum``, which
    rounds once per element exactly like the sequential fold. Use on
    pair-join hot paths; inputs are expected non-null and equal-length
    (embedding tables) — rows violating that fall back to the exact
    per-row fold, mirroring zip_with's null-padding (unequal lengths
    yield NULL).
    """
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    arrs_a = a.to_numpy()
    arrs_b = b.to_numpy()
    lens_ok = True
    try:
        la = np.fromiter((len(x) for x in arrs_a), dtype=np.int64, count=n)
        lb = np.fromiter((len(x) for x in arrs_b), dtype=np.int64, count=n)
        lens_ok = n > 0 and la.min() == la.max() == lb.min() == lb.max()
    except TypeError:  # a None slipped in
        lens_ok = False
    if lens_ok:
        A = np.stack(arrs_a).astype(np.float64)
        B = np.stack(arrs_b).astype(np.float64)
        if A.shape[1] == 0:
            out[:] = 0.0
        else:
            np.cumsum(A * B, axis=1, out=A)
            out[:] = A[:, -1]
        return pd.Series(out)
    # slow path: ragged / null rows (never hit on embedding tables)
    res: list[float | None] = []
    for x, y in zip(arrs_a, arrs_b):
        if x is None or y is None or len(x) != len(y):
            res.append(None)
            continue
        acc = 0.0
        for xi, yi in zip(x, y):
            acc = acc + float(xi) * float(yi)
        res.append(acc)
    return pd.Series(res, dtype="float64")


def dim_index_frame(spark, d: int, upper_triangle: bool = False):
    """Constant dimension-index frame for broadcast-expansion plans:
    ``(i)`` rows 0..d-1, or the ``(i, j)`` upper triangle (j >= i,
    d(d+1)/2 rows). Cross-joining data rows against a BROADCAST of
    this frame with :func:`elem_double` lookups replaces nested
    higher-order-function expansions (HOF lambdas evaluate interpreted
    per element; the join + partial agg fuse into one whole-stage-
    codegen pass — q127 measured 2.8x). The expansion never SortMerge-
    joins the data side (plan-pinned by
    tests/test_curation_queries.py)."""
    idx = spark.range(d).select(F.col("id").alias("i"))
    if not upper_triangle:
        return idx
    return idx.crossJoin(
        spark.range(d).select(F.col("id").alias("j"))
    ).filter(F.col("j") >= F.col("i"))


def elem_double(vec: Column | str, idx: Column | str) -> Column:
    """``element_at(vec, idx + 1)`` cast to double — the codegen'd
    per-dimension lookup paired with :func:`dim_index_frame` (0-based
    index column, 1-based ``element_at``)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    i = F.col(idx) if isinstance(idx, str) else idx
    return F.element_at(c, (i + 1).cast("int")).cast("double")


def quantize_int8_expr(vec: Column | str) -> Column:
    """Symmetric int8 quantization of an embedding: scale = max |x| of
    the vector, each element -> floor(x / scale * 127 + 0.5) clamped to
    [-127, 127]. Returns struct(scale double, q array<tinyint>).

    Engine-neutral by construction: ``floor(x + 0.5)`` (half-up) is
    used instead of round() because Spark and DuckDB disagree on
    round()'s tie rule (half-even vs half-away); floor of an IEEE
    double is bit-deterministic in both. A zero (or all-zero) vector
    quantizes to scale 0 and all-zero codes.

    This is the storage tier for 100 TB embedding columns: 4x smaller
    than float32, one narrow per-row expression, no shuffle; dequantize
    with ``dequantize_int8_expr`` (max abs error scale/254).
    """
    v = _as_double(vec)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        v,
        lambda x: F.least(
            F.lit(127.0),
            F.greatest(
                F.lit(-127.0),
                F.floor(
                    F.when(scale == 0.0, F.lit(0.0)).otherwise(
                        x / scale * 127.0
                    )
                    + F.lit(0.5)
                ).cast("double"),
            ),
        ).cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8_expr(scale: Column | str, q: Column | str) -> Column:
    """Inverse of ``quantize_int8_expr``: q * scale / 127 as
    array<double> (exact IEEE: one multiply + one divide per element,
    identical in any engine)."""
    s = F.col(scale) if isinstance(scale, str) else scale
    qc = F.col(q) if isinstance(q, str) else q
    return F.transform(
        qc, lambda x: x.cast("double") * s / F.lit(127.0)
    )
