"""Product quantization (PQ) for embedding search — the compression
half of FAISS-style IVF-PQ, completing the engine's ANN family
(brute-force q24, IVF q25, k-NN join q47, LSH q43/q143): each vector
splits into ``m`` subvectors, every subvector is replaced by the id of
its nearest per-subspace codebook centroid (``m`` small ints instead
of ``dim`` floats — 64x compression at dim=64/m=8/ksub<=256), and
queries rank candidates with the Asymmetric Distance Computation
(ADC): a per-query (m x ksub) lookup table of exact subspace
distances, summed per candidate by code.

Spark-first shape: encode and ADC are Arrow-batched vectorized pandas
UDFs over a BROADCAST codebook (ksub x dim floats — the k x d
driver-collect envelope every iterative fit in this engine already
uses, see clustering.py) — entirely NARROW, zero shuffles; top-k is a
TakeOrderedAndProject. At 100 TB the scan reads m-byte codes instead
of dim-float vectors — that IO ratio is the point of PQ.

Determinism contract: subspace distances accumulate SEQUENTIALLY over
the subvector dims in float64 (the `_fold_dots` rule — one IEEE
rounding per added element, matching the DuckDB list_reduce fold);
argmin scans codes in order (ties -> lowest code, = ORDER BY dist,
code); ADC sums integer MICRO-distances (floor(1e6 * d) per subspace),
so the per-candidate total is an order-independent integer sum. The
production codebook is :func:`subspace_lloyd_codebook` — per-subspace
deterministic Lloyd's centroids trained in ONE joint pass (q147's
oracle replays the fit; recall@k improvement over the head codebook is
pinned by test); :func:`head_codebook` (first ``ksub`` vectors by id)
remains as the trivial baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

__all__ = [
    "head_codebook",
    "subspace_lloyd_codebook",
    "pq_encode",
    "pq_adc_topk",
]


def head_codebook(
    emb: DataFrame,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic (ksub, dim) float64 codebook: the ``ksub`` lowest-
    id vectors. A k x d driver collect (the clustering.py envelope)."""
    rows = (
        emb.orderBy(id_col).limit(ksub).select(id_col, vec_col).collect()
    )
    return np.array(
        [r[1] for r in sorted(rows, key=lambda r: r[0])], dtype=np.float64
    )


def subspace_lloyd_codebook(
    emb: DataFrame,
    ksub: int,
    m: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """TRAINED (ksub, dim) float64 codebook: per-subspace Lloyd's
    k-means — the real PQ fit (each of the ``m`` subquantizers gets
    centroids of ITS subvector distribution, unlike
    :func:`head_codebook`'s arbitrary head rows; round-6 VERDICT #3).

    Spark-first shape — ALL ``m`` subspace fits advance in one joint
    pass: the corpus explodes once into (id, subspace, subvector)
    points (a broadcast-range crossJoin + ``slice`` — narrow), and
    each Lloyd iteration is ONE argmin-assignment expression over the
    per-subspace literal centers plus ONE (subspace, code, pos) groupBy
    with map-side combine. Per iteration the driver collects only the
    m * ksub * dsub = ksub * dim aggregate rows (the bounded k x d
    envelope of clustering.py), so a 100 TB corpus costs n_iters scans
    total, not m * n_iters.

    Determinism contract (mirrored by the q147 oracle's SQL twin,
    ``plans/llm_queries._subspace_lloyd_sql``): embeddings quantize to
    integer micros (FLOOR(x * 1e6 + 0.5)); seeds are the ``ksub``
    vectors with the smallest (md5(id), id), their subvectors seeding
    every subspace; assignment is the integer squared-L2 argmin with
    code-asc tiebreak; means are exact floor divisions; an empty code
    keeps its previous center. Returned centroids are micros / 1e6 —
    the identical IEEE division in both engines.
    """
    spark = emb.sparkSession
    dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        raise ValueError("dim must divide into m subspaces")
    dsub = dim // m
    q = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast(
                "long"
            ),
        ).alias("qv"),
    ).localCheckpoint(eager=True)
    sidx = spark.range(m).select(F.col("id").cast("long").alias("s"))
    pts = q.crossJoin(F.broadcast(sidx)).select(
        "__id",
        "s",
        F.slice("qv", F.col("s") * dsub + 1, dsub).alias("qs"),
    )

    seeds = (
        q.withColumn("h", F.md5(F.col("__id").cast("string")))
        .orderBy("h", "__id")
        .limit(ksub)
        .collect()
    )
    # centers[s][code] = list[int] of dsub micros
    centers: list[list[list[int]]] = [
        [list(r["qv"])[s * dsub : (s + 1) * dsub] for r in seeds]
        for s in range(m)
    ]

    def _assigned(centers_now):
        # one SQL literal (nested array of per-subspace struct arrays)
        # instead of m*ksub*dsub F.lit calls — the clustering.py py4j
        # round-trip lesson
        per_s = ", ".join(
            "array({})".format(
                ", ".join(
                    "struct({c}L AS code, array({vs}) AS cv)".format(
                        c=c, vs=", ".join(f"{int(v)}L" for v in cv)
                    )
                    for c, cv in enumerate(centers_now[s])
                )
            )
            for s in range(m)
        )
        best = F.expr(
            f"array_min(transform(element_at(array({per_s}), "
            "CAST(s + 1 AS INT)), c -> struct("
            "aggregate(zip_with(qs, c.cv, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, x) -> acc + x) AS d2, c.code AS code))).code"
        )
        return pts.select("__id", "s", "qs", best.alias("code"))

    for _ in range(n_iters):
        means = (
            _assigned(centers)
            .select("s", "code", F.posexplode("qs").alias("pos", "val"))
            .groupBy("s", "code", "pos")
            .agg(F.sum("val").alias("sm"), F.count(F.lit(1)).alias("n"))
            .select(
                "s",
                "code",
                "pos",
                F.expr("(sm - pmod(sm, n)) DIV n").alias("mn"),
            )
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, int]] = {}
        for r in means:
            upd.setdefault((r["s"], r["code"]), {})[r["pos"]] = r["mn"]
        for s in range(m):
            for c in range(ksub):
                got = upd.get((s, c))
                if got:
                    centers[s][c] = [got[p] for p in range(dsub)]

    cb = np.zeros((ksub, dim), dtype=np.float64)
    for s in range(m):
        for c in range(ksub):
            cb[c, s * dsub : (s + 1) * dsub] = (
                np.array(centers[s][c], dtype=np.float64) / 1e6
            )
    return cb


def _subspace_dists(A: np.ndarray, cb: np.ndarray, m: int) -> np.ndarray:
    """(n, dim) x (ksub, dim) -> (n, m, ksub) squared L2 per subspace,
    accumulated SEQUENTIALLY over each subspace's dims (exact fold
    order — one rounding per added element, the _fold_dots rule)."""
    n, dim = A.shape
    ksub = cb.shape[0]
    dsub = dim // m
    out = np.zeros((n, m, ksub), dtype=np.float64)
    for s in range(m):
        for j in range(dsub):
            col = s * dsub + j
            diff = A[:, col, None] - cb[None, :, col]
            out[:, s, :] += diff * diff
    return out


def pq_encode(
    emb: DataFrame,
    codebook: np.ndarray,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-subspace-centroid codes.

    Returns (id_col, codes array<int>) — codes[s] = argmin over the
    codebook of the s-th subvector's squared L2 (ties -> lowest code).
    Narrow (one vectorized UDF), zero shuffles.
    """
    dim = codebook.shape[1]
    if dim % m:
        raise ValueError("dim must divide into m subspaces")
    cb = np.ascontiguousarray(codebook, dtype=np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        A = np.array(list(vs), dtype=np.float64)
        if A.size == 0:
            return pd.Series([], dtype=object)
        codes = np.argmin(_subspace_dists(A, cb, m), axis=2)
        return pd.Series(list(codes.astype(np.int32)))

    return emb.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    emb: DataFrame,
    codebook: np.ndarray,
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: rank every OTHER vector by the sum over subspaces of
    the exact (query subvector -> assigned centroid) squared distance,
    in integer micros. Returns (id_col, codes_str, adc_micros) ordered
    ascending with id tiebreak; ``codes_str`` exposes the PQ codes
    ('c0-c1-...') so the encoding itself is value-checked, not just
    the ranking.

    An exact duplicate of the query encodes to the per-subspace argmin
    codes, so it achieves the global ADC minimum and always ranks
    first — pinned by test.
    """
    q = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(vec_col)
        .collect()
    )
    if len(q) != 1:
        raise ValueError(f"query vector {query_vec_id} not found")
    qv = np.array(q[0][0], dtype=np.float64)[None, :]
    # (m, ksub) integer micro-distance lookup table
    dtab = np.floor(1e6 * _subspace_dists(qv, codebook, m)[0]).astype(
        np.int64
    )

    codes = pq_encode(emb, codebook, m, id_col=id_col, vec_col=vec_col)

    @F.pandas_udf(LongType())
    def adc(cs: pd.Series) -> pd.Series:
        C = np.array(list(cs), dtype=np.int64)
        if C.size == 0:
            return pd.Series([], dtype=np.int64)
        total = np.zeros(C.shape[0], dtype=np.int64)
        for s in range(m):
            total += dtab[s, C[:, s]]  # integer sum: order-independent
        return pd.Series(total)

    return (
        codes.filter(F.col(id_col) != query_vec_id)
        .select(
            id_col,
            F.concat_ws(
                "-", F.transform("codes", lambda c: c.cast("string"))
            ).alias("codes_str"),
            adc(F.col("codes")).alias("adc_micros"),
        )
        .orderBy(F.asc("adc_micros"), F.asc(id_col))
        .limit(k)
    )
