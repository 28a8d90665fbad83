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

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..functions.vectors import cosine_similarity_expr, dot_product_expr


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
    big side beyond the final aggregation, which AQE keeps local.

    Zero-norm vectors (padding rows, empty docs) score NULL against
    every centroid (try_divide); NULL is coalesced to -2.0 — below any
    real cosine — so the argmax deterministically assigns them to the
    lowest centroid id instead of dropping to a NULL assignment that
    would diverge from the SQL-oracle formulation (where NULL scores
    tie and the id tiebreak picks centroid 0)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        F.coalesce(
            cosine_similarity_expr(vec_col, centroid_vec_col), F.lit(-2.0)
        ).alias("c"),
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


def triplet_mining(
    embeddings: DataFrame,
    anchor_mod: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative / positive TRIPLET mining for embedding training
    (the data-prep step behind contrastive / triplet-loss fine-tuning):
    for every anchor (a deterministic 1/anchor_mod id-sample standing
    in for a training batch), find its hardest negative — the
    MAX-cosine vector with a DIFFERENT label — and its best positive
    (max-cosine, same label), plus the margin between them.

    Scale shape: the anchor batch is small by construction and is
    BROADCAST against one scan of the corpus (this is a bounded
    query-batch x corpus product, the same contract as q24/q47 — the
    per-training-step pattern, never corpus x corpus); both argmaxes
    are conditional ``max_by`` in ONE hash aggregation on anchor_id
    (map-side combined), so the corpus shuffles once, keyed by a
    batch-sized key space.

    Zero-norm vectors score NULL cosine (try_divide) and are coalesced
    to -2.0 — below every real cosine — so they can never be chosen as
    hardest negative/positive while keeping both engines' argmax
    deterministic (q25's convention). Ties break toward the LOWEST
    candidate id via the (cosine, -id) ordering struct. ``margin`` is
    one IEEE subtraction of two identical doubles — engine-portable.
    Anchors with no same-label peer yield NULL positive columns.
    """
    anchors = embeddings.filter(
        F.col(id_col) % anchor_mod == 0
    ).select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("__av"),
        F.col(label_col).alias("anchor_label"),
    )
    scored = (
        embeddings.crossJoin(F.broadcast(anchors))
        .filter(F.col(id_col) != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col(id_col).alias("__cid"),
            F.col(label_col).alias("__clabel"),
            F.coalesce(
                cosine_similarity_expr(vec_col, "__av"), F.lit(-2.0)
            ).alias("__c"),
        )
    )
    val = F.struct(F.col("__c").alias("c"), F.col("__cid").alias("i"))
    order = F.struct(F.col("__c"), (-F.col("__cid")).alias("__ti"))
    pos_match = F.col("__clabel") == F.col("anchor_label")
    agg = scored.groupBy("anchor_id", "anchor_label").agg(
        F.max_by(
            F.when(pos_match, val), F.when(pos_match, order)
        ).alias("__pos"),
        F.max_by(
            F.when(~pos_match, val), F.when(~pos_match, order)
        ).alias("__neg"),
    )
    return agg.select(
        "anchor_id",
        "anchor_label",
        F.col("__pos.i").alias("pos_id"),
        F.col("__pos.c").alias("pos_cosine"),
        F.col("__neg.i").alias("neg_id"),
        F.col("__neg.c").alias("neg_cosine"),
        (F.col("__pos.c") - F.col("__neg.c")).alias("margin"),
    )


def rademacher_hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random +-1 (Rademacher) hyperplanes derived
    from md5 — engine-neutral, so a DuckDB oracle can embed the exact
    same planes as literals. Sign-of-dot with +-1 components is the
    classic sign-random-projection (SimHash for real vectors, Charikar
    2002): P[sign agrees] = 1 - angle/pi, and products by +-1.0 are
    bit-exact in IEEE double, keeping Spark and the oracle identical."""
    planes: list[list[float]] = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"rhp:{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _fold_dots(A: np.ndarray, P: np.ndarray) -> np.ndarray:
    """(n, dim) x (planes, dim) -> (n, planes) dot products with the
    EXACT left-to-right fold rounding (one IEEE rounding per added
    element, same as the HOF/list_reduce fold), accumulated
    sequentially over dim — O(n * planes) memory, never the
    (n, planes, dim) product tensor a cumsum formulation materializes
    (553 MB transient per 10k-row batch at 108 planes x 64 dims).
    Module-level but referenced ONLY from inside the UDF factories via
    the module-global; local mode shares the process and cluster mode
    ships the repo as a py-files/wheel either way (see session.py)."""
    dots = np.zeros((A.shape[0], P.shape[0]), dtype=np.float64)
    for j in range(A.shape[1]):
        dots += A[:, j, None] * P[None, :, j]
    return dots


def _packed_signbits_udf(planes: list[list[float]]):
    """Arrow-batched UDF: all hyperplane sign bits of a vector packed
    into one long (plane i -> bit i).

    Vectorized numpy with the same numerics as the interpreted HOF
    fold it replaces: elementwise products accumulated strictly
    left-to-right (:func:`_fold_dots` — one IEEE rounding per element),
    so each sign matches the oracle's ``list_reduce`` fold bit-for-bit
    — and +-1.0 products are themselves exact. The HOF formulation
    evaluated num_planes folds per row interpreted; this is one numpy
    pass per Arrow batch.
    """
    P = np.asarray(planes, dtype=np.float64)  # (num_planes, dim)
    weights = np.left_shift(
        np.uint64(1), np.arange(P.shape[0], dtype=np.uint64)
    )

    @pandas_udf(LongType())
    def packed_signbits(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        A = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (_fold_dots(A, P) >= 0).astype(np.uint64)
        vals = (bits * weights).sum(axis=1, dtype=np.uint64)
        # view, not astype: bit 63 set means the uint64 exceeds the
        # signed range; reinterpret preserves the bit pattern
        return pd.Series(vals.view(np.int64))

    return packed_signbits


def _packed_signbits_multi_udf(
    planes: list[list[float]], rows_per_band: int, num_bands: int
):
    """Arrow-batched UDF: sign bits packed into an ``array<long>`` with
    a band-aligned layout — band b's ``rows_per_band`` bits live wholly
    inside long ``b // bands_per_long`` at bit offset
    ``(b % bands_per_long) * rows_per_band`` (``bands_per_long =
    64 // rows_per_band``), so no band ever straddles a long boundary
    and per-band extraction stays a single shift+mask. Same exact
    numerics as :func:`_packed_signbits_udf` (strict left-to-right
    cumsum fold, exact +-1.0 products); logical plane order is
    band-major: plane ``b * rows_per_band + r`` is band b, row r."""
    from pyspark.sql.types import ArrayType

    P = np.asarray(planes, dtype=np.float64)  # (num_planes, dim)
    bands_per_long = 64 // rows_per_band
    n_longs = -(-num_bands // bands_per_long)
    plane_long = np.array(
        [
            (p // rows_per_band) // bands_per_long
            for p in range(P.shape[0])
        ],
        dtype=np.int64,
    )
    plane_weight = np.array(
        [
            1
            << (
                ((p // rows_per_band) % bands_per_long) * rows_per_band
                + p % rows_per_band
            )
            for p in range(P.shape[0])
        ],
        dtype=np.uint64,
    )

    @pandas_udf(ArrayType(LongType()))
    def packed_signbits_multi(v: pd.Series) -> pd.Series:
        n = len(v)
        if n == 0:
            return pd.Series([])
        A = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (_fold_dots(A, P) >= 0).astype(np.uint64)  # (n, planes)
        out = np.zeros((n, n_longs), dtype=np.uint64)
        for li in range(n_longs):
            sel = plane_long == li
            out[:, li] = (bits[:, sel] * plane_weight[sel]).sum(
                axis=1, dtype=np.uint64
            )
        signed = out.view(np.int64)
        return pd.Series(list(signed))

    return packed_signbits_multi


def _band_layout(dim: int, rows_per_band: int, num_bands: int, vec_col: str):
    """Shared packed-signature layout for the self-join
    (:func:`hyperplane_lsh_candidates`) and cross-corpus
    (:func:`hyperplane_lsh_cross_candidates`) band joins.

    Returns ``(sig_col, band_sig, band_xor_zero)``:

    * ``sig_col`` — expression computing ALL band signatures of
      ``vec_col`` packed into one long (<= 64 planes) or a
      band-aligned ``array<long>``;
    * ``band_sig(b)`` — extracts band ``b``'s signature from a column
      named ``allsigs``;
    * ``band_xor_zero(b)`` — true iff band ``b`` matches between two
      packed columns named ``__sa`` / ``__sb`` (the XOR first-match
      dedup that replaces a post-join ``distinct()``).
    """
    if rows_per_band > 63:
        # 64 would need mask = (1 << 64) - 1, which overflows the
        # signed-long literal F.lit() builds; 63 bits per band is
        # already far past any useful selectivity (2^-63 per band)
        raise ValueError("rows_per_band must be <= 63 (one band per long)")
    num_planes = rows_per_band * num_bands
    mask = (1 << rows_per_band) - 1
    bands_per_long = 64 // rows_per_band
    planes = rademacher_hyperplanes(num_planes, dim)

    if num_planes <= 64:
        # plane i is bit i of ONE long; band b occupies bits
        # [b*rows_per_band, (b+1)*rows_per_band)
        sig_col = _packed_signbits_udf(planes)(F.col(vec_col))

        def band_sig(b):
            return (
                F.shiftright(F.col("allsigs"), b * rows_per_band)
                .bitwiseAND(F.lit(mask))
            )

        def band_xor_zero(b):
            # shiftleft, not a Python literal: the top band's mask
            # overflows a signed 64-bit literal
            return (
                F.col("__sa").bitwiseXOR(F.col("__sb")).bitwiseAND(
                    F.shiftleft(
                        F.lit(mask).cast("long"), b * rows_per_band
                    )
                )
                == 0
            )

    else:
        # band-aligned multi-long layout: band b lives in long
        # b // bands_per_long at bit offset (b % bands_per_long) * rpb
        sig_col = _packed_signbits_multi_udf(
            planes, rows_per_band, num_bands
        )(F.col(vec_col))

        def band_sig(b):
            return (
                F.shiftright(
                    F.element_at("allsigs", b // bands_per_long + 1),
                    (b % bands_per_long) * rows_per_band,
                ).bitwiseAND(F.lit(mask))
            )

        def band_xor_zero(b):
            li, off = b // bands_per_long, (b % bands_per_long)
            return (
                F.element_at("__sa", li + 1)
                .bitwiseXOR(F.element_at("__sb", li + 1))
                .bitwiseAND(
                    F.shiftleft(
                        F.lit(mask).cast("long"), off * rows_per_band
                    )
                )
                == 0
            )

    return sig_col, band_sig, band_xor_zero


def _banded_tags(
    df: DataFrame,
    id_col: str,
    sig_col,
    band_sig,
    num_bands: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """One (id, band, sig, allsigs) row per (vector, band), with
    oversized (band, sig) buckets dropped when capped."""
    with_sigs = df.select(F.col(id_col), sig_col.alias("allsigs"))
    band_sigs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
            for b in range(num_bands)
        ]
    )
    tagged = (
        with_sigs.select(
            F.col(id_col), "allsigs", F.explode(band_sigs).alias("bs")
        )
        .select(
            id_col,
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
            "allsigs",
        )
    )
    if max_bucket_size is not None:
        ok = (
            tagged.groupBy("band", "sig")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("band", "sig")
        )
        tagged = tagged.join(ok, ["band", "sig"])
    return tagged


def hyperplane_lsh_candidates(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_band: int = 2,
    num_bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH candidate pairs for embedding near-dup —
    the bucketed scale path behind the exact all-pairs baseline
    (plans/llm_queries.q26). Never quadratic: each vector computes
    ``rows_per_band * num_bands`` sign bits in one vectorized Arrow
    batch (:func:`_packed_signbits_udf` — bit-identical to the
    interpreted HOF fold it replaces), explodes to ``num_bands``
    (band, signature) rows, and the only shuffle is the equi-join on
    (band, signature) — work is proportional to bucket sizes, not n².

    Tuning is threshold-driven: P[one plane agrees] = 1 - theta/pi, so
    a production near-dup threshold (cosine >= 0.9, p ~ 0.857) prunes
    sharply with rows_per_band=8 (see tests), while a near-random
    threshold like 0.35 (p ~ 0.614) needs short bands
    (rows_per_band=2) for recall and legitimately retains most pairs —
    that is a property of the threshold, not the algorithm.

    ``max_bucket_size`` caps degenerate buckets (e.g. all-zero
    vectors collapse to one signature): buckets larger than the cap are
    dropped before the pair join, bounding the worst-case bucket cost
    at a (documented) recall loss.

    Dedup is SHUFFLE-FREE: a pair co-bucketed in several bands is
    emitted only from its FIRST matching band. Every tagged row carries
    all band signatures packed into one long; after the band equi-join,
    ``XOR`` of the two packed longs localizes which bands match, and a
    row survives only when its band is the minimum matching band. That
    replaces the classic ``distinct()`` (a full shuffle of the
    *multiplied* join output — bands x candidate pairs rows) with a
    per-row bitmask filter applied inside the join stage.

    Packing: up to 64 sign bits fit one long; beyond that (the log-
    scaled tuning rule — band bits ~ log n — wants MORE total bits as
    the corpus grows, see SCALING_LLM.json) signatures pack into an
    ``array<long>`` with every band fully inside one long
    (``bands_per_long = 64 // rows_per_band``), so per-band extraction
    and the XOR first-match dedup stay single-long bit ops either way.
    Requires ``rows_per_band <= 63`` (a 64-bit band mask would
    overflow the signed-long literal); bit 63 is the long's sign bit,
    which two's-complement bitwise ops handle fine.

    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    from .skew import spread_partitions

    embeddings = spread_partitions(embeddings, id_col)
    sig_col, band_sig, band_xor_zero = _band_layout(
        dim, rows_per_band, num_bands, vec_col
    )
    tagged = _banded_tags(
        embeddings, id_col, sig_col, band_sig, num_bands, max_bucket_size
    )
    a = tagged.select(
        F.col(id_col).alias("id_a"), "band", "sig",
        F.col("allsigs").alias("__sa"),
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"), "band", "sig",
        F.col("allsigs").alias("__sb"),
    )
    # least() skips NULLs -> the minimum band whose signature group is
    # identical for the pair; the joined band always matches, so this
    # is never NULL. NOTE under max_bucket_size a pair's first matching
    # band may have been dropped as oversized, suppressing the pair in
    # that band AND here (emission requires band == first match over
    # ALL bands) — same recall trade the cap already documents.
    first_match = F.least(
        *[
            F.when(band_xor_zero(bb), F.lit(bb))
            for bb in range(num_bands)
        ]
    )
    return (
        a.join(b, ["band", "sig"])
        .filter((F.col("id_a") < F.col("id_b")) & (F.col("band") == first_match))
        .select("id_a", "id_b")
    )


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_band: int = 2,
    num_bands: int = 16,
    threshold: float = 0.35,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates -> exact-cosine verification (>= ``threshold``).

    The verify joins embeddings back to the candidate pairs only, so
    (unlike an all-pairs scan) exact-cosine work is bounded by the
    candidate count. Output columns (id_a, id_b, cosine) match the
    exact baseline's, enabling pair-for-pair recall checks.
    """
    cand = hyperplane_lsh_candidates(
        embeddings,
        dim,
        id_col=id_col,
        vec_col=vec_col,
        rows_per_band=rows_per_band,
        num_bands=num_bands,
        max_bucket_size=max_bucket_size,
    )
    from ..functions.vectors import pair_dot_fold

    ea = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__na"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__nb"),
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            # pair_dot_fold: vectorized Arrow batch, bit-identical to
            # the HOF fold (the HOF lambda is interpreted per element —
            # at candidate-pair cardinality it dominates the query).
            # try_divide: all-zero vectors share every LSH bucket (every
            # dot is 0.0 -> identical signatures) so they WILL reach the
            # verify as candidates; plain division would abort the job
            # under ANSI mode, try_divide yields NULL which the
            # threshold filter drops.
            F.try_divide(
                pair_dot_fold("__va", "__vb"),
                F.col("__na") * F.col("__nb"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_lsh_cross_candidates(
    left: DataFrame,
    right: DataFrame,
    dim: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "embedding",
    rows_per_band: int = 2,
    num_bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH candidates BETWEEN two corpora (text <-> image-caption
    alignment, query <-> document retrieval, crawl <-> benchmark
    matching): both sides hash with the SAME md5-derived hyperplanes,
    and the only shuffle is the (band, signature) equi-join of left
    tags to right tags — never a |left| x |right| cross join.

    The XOR first-match dedup carries over unchanged from the self-join
    path: a pair co-bucketed in several bands is emitted only from its
    minimum matching band, so no post-join ``distinct()`` shuffle of
    the multiplied join output is needed. ``max_bucket_size`` caps each
    side's (band, sig) bucket independently (degenerate buckets — e.g.
    all-zero vectors — are dropped on whichever side explodes).

    Returns distinct (left_id, right_id) candidate pairs. Unlike the
    self-join there is no ``id_a < id_b`` constraint: the two ID spaces
    are unrelated.
    """
    from .skew import spread_partitions

    sig_col, band_sig, band_xor_zero = _band_layout(
        dim, rows_per_band, num_bands, vec_col
    )
    a = _banded_tags(
        spread_partitions(left, left_id),
        left_id, sig_col, band_sig, num_bands, max_bucket_size,
    ).select(
        F.col(left_id), "band", "sig", F.col("allsigs").alias("__sa")
    )
    b = _banded_tags(
        spread_partitions(right, right_id),
        right_id, sig_col, band_sig, num_bands, max_bucket_size,
    ).select(
        F.col(right_id), "band", "sig", F.col("allsigs").alias("__sb")
    )
    first_match = F.least(
        *[
            F.when(band_xor_zero(bb), F.lit(bb))
            for bb in range(num_bands)
        ]
    )
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("band") == first_match)
        .select(left_id, right_id)
    )


def cross_corpus_align(
    left: DataFrame,
    right: DataFrame,
    dim: int,
    threshold: float,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "embedding",
    rows_per_band: int = 2,
    num_bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-corpus embedding alignment: banded LSH candidates between
    two corpora (:func:`hyperplane_lsh_cross_candidates`), verified
    with exact cosine >= ``threshold``. The verify joins each side's
    vectors back to the candidate pairs only, so exact-cosine work is
    bounded by the candidate count — the multimodal pairing shape
    (align 100 TB of text with an image-caption corpus without ever
    forming the cross product).

    Returns (left_id, right_id, cosine).
    """
    cand = hyperplane_lsh_cross_candidates(
        left, right, dim,
        left_id=left_id, right_id=right_id, vec_col=vec_col,
        rows_per_band=rows_per_band, num_bands=num_bands,
        max_bucket_size=max_bucket_size,
    )
    from ..functions.vectors import pair_dot_fold

    ea = left.select(
        F.col(left_id),
        F.col(vec_col).alias("__va"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__na"),
    )
    eb = right.select(
        F.col(right_id),
        F.col(vec_col).alias("__vb"),
        F.sqrt(dot_product_expr(vec_col, vec_col)).alias("__nb"),
    )
    return (
        cand.join(ea, left_id)
        .join(eb, right_id)
        .select(
            left_id,
            right_id,
            # try_divide: all-zero vectors share every bucket (all dots
            # 0.0) and reach the verify; NULL cosine drops at the
            # threshold instead of aborting under ANSI mode.
            F.try_divide(
                pair_dot_fold("__va", "__vb"),
                F.col("__na") * F.col("__nb"),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


#: k∝n centroid policy: expected vectors per cluster. 45 keeps the
#: base-corpus k equal to the sqrt policy's (sqrt(2000) ~ 2000/45) so
#: the two policies coincide exactly where q75/q77's oracles live and
#: diverge only as the corpus grows past it.
SEMDEDUP_TARGET_CLUSTER = 45


def semdedup_k(
    n_vectors: int, target_cluster_size: int = SEMDEDUP_TARGET_CLUSTER
) -> int:
    """Fixed-CLUSTER-SIZE centroid count for `semantic_dedup` — round
    12, VERDICT r11 #5. The documented k ~ sqrt(n) policy bounds
    within-cluster pairs at ~n^1.5 (measured 3.61x wall at 10x,
    SCALING_LLM.json); k = n / c keeps the expected cluster size
    CONSTANT, so within-cluster pairs stay ~n * (c-1)/2 — linear —
    and the dedup stage's growth follows the corpus, not its power.
    The cost moves to centroid FITTING (per-iteration assignment is
    n*k ~ n^2/c with plain Lloyd): at 100 TB, fit k∝n centers with
    minibatch/hierarchical KMeans or reuse the previous snapshot's
    centers as the seed — the DEDUP stage, which runs per ingest, is
    what this policy keeps linear."""
    if n_vectors < 1:
        raise ValueError(f"n_vectors must be >= 1, got {n_vectors}")
    return max(2, n_vectors // target_cluster_size)


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    gemm_assignment: bool = False,
    blocked_probe: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest centroid, then mark as duplicate any
    vector whose cluster contains a LOWER-id vector with cosine >=
    ``threshold``. Returns (vec_id, centroid_id, kept).

    Scale posture: the quadratic pair scan is confined WITHIN clusters —
    with k ~ sqrt(n) clusters the expected pair count is ~n^1.5, not
    n^2, and the pair join shuffles on centroid_id so each cluster's
    scan is one task. Centroids are an input DataFrame: the test
    harness derives them deterministically from the data (so the
    DuckDB oracle can reproduce them); a production corpus passes
    pyspark.ml KMeans centers instead. Norms are computed once per
    vector before the pair join; per-pair dots use the Arrow-batched
    fold (bit-identical to the HOF fold and the oracle's list_reduce,
    see functions/vectors.py).

    ``gemm_assignment=True`` swaps the fold-based n x k crossJoin
    assignment for `gemm_scan.gemm_assign` — the k∝n policy's scale
    path (assignment cost stops shuffling n x k scored rows). Same
    argmax up to BLAS ulps at near-ties, so gate-oracle entries keep
    the default; the within-cluster prune below is fold-based and
    hash-exact either way.

    ``blocked_probe=m`` (round 13, implies the GEMM path) goes one
    further: the two-level coarse-quantizer assignment
    (`coarse_quantizer.blocked_assign`) probes only the top-m center
    BLOCKS per vector — the per-ingest dedup assignment drops from
    n·k to n·~2√(m·k) distance work (measured 9.02s → 1.01s at 50×
    corpus, k=2222), at the probe's documented approximation (96-97%
    of full-assignment dedup duty at m=8). Scale path only, never a
    gate-oracle entry.
    """
    from ..functions.vectors import l2_norm_expr, pair_dot_fold

    if blocked_probe is not None:
        from .coarse_quantizer import blocked_assign

        assigned = blocked_assign(
            embeddings, centroids, blocked_probe,
            id_col=id_col, vec_col=vec_col,
        )
    elif gemm_assignment:
        from .gemm_scan import gemm_assign

        assigned = gemm_assign(embeddings, centroids, id_col, vec_col)
    else:
        assigned = assign_to_centroids(
            embeddings, centroids, id_col, vec_col
        )
    # Materialize the assignment+norm pass ONCE: e feeds the final left
    # join plus BOTH sides of the pair join — without the checkpoint the
    # full-corpus centroid scan and argmax execute three times (the same
    # shared-upstream recompute connected_components fixes the same way).
    e = (
        embeddings.join(assigned, id_col)
        .select(
            id_col,
            "centroid_id",
            F.col(vec_col).alias("__v"),
            l2_norm_expr(vec_col).alias("__n"),
        )
        .localCheckpoint(eager=True)
    )
    a = e.select(
        F.col("centroid_id"),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = e.select(
        F.col("centroid_id"),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    dup_ids = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            # try_divide: zero-norm vectors yield NULL, dropped by the
            # threshold instead of aborting the job under ANSI mode
            F.try_divide(
                pair_dot_fold("__va", "__vb"),
                F.col("__na") * F.col("__nb"),
            )
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return e.join(dup_ids.withColumn("__dup", F.lit(True)), id_col, "left").select(
        id_col,
        "centroid_id",
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
    )
