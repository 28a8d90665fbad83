"""Similarity search over ``array<float>`` embedding columns.

Two tiers, per BASELINE.json's north star:

- ``cosine_topk``: exact brute-force scan — the correctness baseline.
  JVM-side higher-order functions (zip_with + sequential fold), no
  Python, no shuffle except the final top-k (TakeOrderedAndProject).
  At 100 TB this is a single pass over the embedding table and is the
  right answer for one-off queries.
- ``ivf_topk``: IVF-style pruned search — vectors are pre-assigned to
  their nearest centroid (one narrow pass), and a query probes only
  ``nprobe`` clusters, cutting the scanned fraction to ~nprobe/k.
  Centroid assignment is itself a broadcast join (centroid set is tiny
  by construction).

Determinism: dot products fold left-to-right in index order, which both
Spark (``aggregate``) and the DuckDB oracle (``list_reduce``) implement
identically, so scores are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_expr


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours of the vector with ``query_vec_id``.

    Columns: (vec_id, cosine), ordered by cosine desc with id tiebreak.
    """
    q = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("__qv"))
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_similarity_expr(vec_col, "__qv").alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def assign_to_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
) -> DataFrame:
    """IVF list assignment: each vector -> its max-cosine centroid
    (ties broken by lowest centroid id). Broadcast nested-loop over the
    small centroid set, then a per-vector argmax — no shuffle of the
    big side beyond the final aggregation, which AQE keeps local."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        cosine_similarity_expr(vec_col, centroid_vec_col).alias("c"),
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.col(centroid_id_col), F.struct(F.col("c"), -F.col(centroid_id_col))
        ).alias(centroid_id_col)
    )
    return best


def ivf_topk(
    embeddings: DataFrame,
    centroids: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's ``nprobe``
    nearest clusters. Returns (vec_id, cosine)."""
    assigned = assign_to_centroids(embeddings, centroids, id_col, vec_col)
    q = embeddings.filter(F.col(id_col) == query_vec_id)
    q_clusters = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            F.col("centroid_id"),
            cosine_similarity_expr(vec_col, "centroid_vec").alias("c"),
        )
        .orderBy(F.desc("c"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = (
        embeddings.join(assigned, id_col)
        .join(F.broadcast(q_clusters), "centroid_id")
        .filter(F.col(id_col) != query_vec_id)
    )
    qv = q.select(F.col(vec_col).alias("__qv"))
    scored = candidates.crossJoin(F.broadcast(qv)).select(
        F.col(id_col),
        cosine_similarity_expr(vec_col, "__qv").alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
