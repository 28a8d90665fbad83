"""Multi-probe hyperplane LSH — query-side recall without more index.

Plain banded LSH trades recall for index size: more bands (more
tables) catch more true neighbors but cost another full copy of the
signature index EACH. Multi-probe (Lv et al., VLDB'07) takes the other
lever: at QUERY time, probe not just the query's own bucket but the
buckets its signature ALMOST landed in — for sign-bit signatures,
every bucket at Hamming distance 1 within each band (flip one of the
``rows_per_band`` bits). A near-miss neighbor differs from the query
in one plane's sign with probability ~rpb*p^(rpb-1)*(1-p), exactly the
mass one bit-flip recovers, so T = num_bands * (1 + rows_per_band)
probes buy roughly the recall of doubling the band count with ZERO
extra index — the right trade when the corpus index is 100 TB-scale
and queries are the small side.

Implementation is Spark-first: the probe expansion is a narrow
explode on the QUERY side only (queries are small by premise — the
corpus index is never expanded or rewritten), and matching stays a
(band, sig) equi-join against the corpus tags, the same shuffle shape
as single-probe. Candidate verification is the engine's standard
exact-cosine pass, bounded by candidate count.

Determinism: the same md5-derived Rademacher hyperplanes and packed
integer signatures as `operators/similarity.py` — bit flips are
integer XORs, so any engine replays candidates exactly
(`plans/multiprobe_queries.py` pins this against SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _band_layout, _banded_tags, dot_product_expr

__all__ = [
    "multiprobe_lsh_cross_candidates",
    "multiprobe_align",
]


def multiprobe_lsh_cross_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    rows_per_band: int = 8,
    num_bands: int = 4,
    n_flips: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (query_id, corpus_id) candidates where the corpus
    vector's band signature is within Hamming distance 1 of the
    query's in at least one band (``n_flips`` limits which bit
    positions are probed; default all ``rows_per_band``). The corpus
    side is tagged exactly as single-probe LSH — ONLY the query side
    explodes into 1 + n_flips probe signatures per band."""
    n_flips = rows_per_band if n_flips is None else int(n_flips)
    if not 0 <= n_flips <= rows_per_band:
        raise ValueError("n_flips must be in 0..rows_per_band")
    sig_col, band_sig, _ = _band_layout(
        dim, rows_per_band, num_bands, vec_col
    )
    q = _banded_tags(
        queries, query_id, sig_col, band_sig, num_bands, None
    ).select(query_id, "band", "sig")
    c = _banded_tags(
        corpus, corpus_id, sig_col, band_sig, num_bands, max_bucket_size
    ).select(corpus_id, "band", "sig")
    probes = F.array(
        F.col("sig"),
        *[
            F.col("sig").bitwiseXOR(F.lit(1 << i))
            for i in range(n_flips)
        ],
    )
    q_probed = q.select(
        query_id, "band", F.explode(probes).alias("sig")
    )
    return (
        q_probed.join(c, ["band", "sig"])
        .select(query_id, corpus_id)
        .distinct()
    )


def multiprobe_align(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    threshold: float,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    rows_per_band: int = 8,
    num_bands: int = 4,
    n_flips: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Multi-probe candidates verified with exact cosine >=
    ``threshold`` — (query_id, corpus_id, cosine), the retrieval twin
    of `similarity.cross_corpus_align` with the probe expansion on the
    query side."""
    cand = multiprobe_lsh_cross_candidates(
        queries, corpus, dim,
        query_id=query_id, corpus_id=corpus_id, vec_col=vec_col,
        rows_per_band=rows_per_band, num_bands=num_bands,
        n_flips=n_flips, max_bucket_size=max_bucket_size,
    )
    from ..functions.vectors import pair_dot_fold

    ea = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("__va"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__na"),
    )
    eb = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("__vb"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__nb"),
    )
    return (
        cand.join(ea, query_id)
        .join(eb, corpus_id)
        .select(
            query_id,
            corpus_id,
            # try_divide: all-zero vectors co-bucket everywhere (every
            # dot is 0.0) and reach the verify; NULL cosine drops at
            # the threshold instead of aborting under ANSI mode.
            F.try_divide(
                pair_dot_fold("__va", "__vb"),
                F.col("__na") * F.col("__nb"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
