"""Distributed PCA over an embedding column.

The data-scale-dependent work is ONE pass computing the sufficient
statistics (n, mean vector, Gram matrix) — Arrow-batched numpy partial
sums per partition reduced to a d x d matrix, the same shape
`plans/insight_queries.q127_embedding_gram` pins hash-exact against
DuckDB. The eigendecomposition runs driver-side on the tiny d x d
covariance (numpy `eigh` — deterministic for a fixed input), exactly
like `clustering.fit_centroids` runs Lloyd's on broadcast state; the
component matrix then broadcasts back into a vectorized projection.

Scale: fit = one scan + one tiny collect (32 partials of d^2 doubles);
projection = narrow Arrow-batched matmul, no shuffle. Nothing is
quadratic in rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", n_components: int = 8
):
    """Fit PCA: returns (components [k x d], mean [d], explained_var
    [k] — eigenvalue order, descending). NULL vector rows are skipped;
    ragged dimensions fail the numpy stack (the corpus contract is a
    fixed-d embedding column).

    Sign convention: each component is flipped so its
    largest-|coordinate| entry is positive — `eigh` sign ambiguity
    would otherwise make re-runs emit mirrored projections.
    """
    schema = "n long, s binary, ss binary"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for b in batches:
            x = np.stack(b.iloc[:, 0].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "ss": [ss.tobytes()]}
            )

    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(partials, schema=schema)
        .collect()
    )
    if not parts:
        raise ValueError("fit_pca: empty input")
    d = len(np.frombuffer(parts[0].s, dtype=np.float64))
    n = sum(p.n for p in parts)
    s = np.sum(
        [np.frombuffer(p.s, dtype=np.float64) for p in parts], axis=0
    )
    gram = np.sum(
        [
            np.frombuffer(p.ss, dtype=np.float64).reshape(d, d)
            for p in parts
        ],
        axis=0,
    )
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # k x d
    flip = np.sign(comps[np.arange(len(order)), np.abs(comps).argmax(1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return comps, mean, evals[order]


def project_pca(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim PCA projection of ``vec_col``. Narrow
    Arrow-batched matmul; components/mean ride in the task closure
    (k*d doubles — trivially broadcastable)."""
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    @F.pandas_udf(ArrayType(FloatType()))
    def proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mu
        out = x @ comps.T
        return pd.Series(list(out.astype(np.float32)))

    return df.withColumn(out_col, proj(F.col(vec_col)))
