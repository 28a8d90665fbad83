"""Asymmetric set-containment join — "document A is (mostly) inside
document B" detection, the subsumption case symmetric Jaccard misses.

A short document quoted wholesale inside a long one has LOW Jaccard
(the union is dominated by the long side) but containment
``|A∩B| / |A|`` near 1 — exactly the quote-expansion / page-wrapping /
aggregator-subsumption duplicates a curation pipeline wants attributed
to their source. MinHash-LSH cannot find these either (band collision
probability tracks Jaccard, not containment), so this is its own
operator, built on the prefix-filter idea with the ASYMMETRIC bound:

For ordered pair (A, B), containment >= t forces ``|A∩B| >= ceil(t*|A|)``
— a bound on A's side only. Order every document's shingles by one
GLOBAL total order (document frequency asc, shingle asc — rare first):
if B misses ALL of A's first ``|A| - ceil(t*|A|) + 1`` shingles, the
overlap is at most ``ceil(t*|A|) - 1`` and the pair cannot qualify. So
only A-side PREFIXES enter the candidate join; the B side must offer
its full posting list (no threshold bounds B — that is the price of
asymmetry), pruned by the one length filter containment does admit:
``|B| >= ceil(t*|A|)`` (the overlap can't exceed |B|).

Scale posture: candidate volume is sum over prefix shingles of their
document frequency — rare-first ordering keeps prefix shingles rare by
construction, so the posting join stays bounded where an open shingle
self-join explodes on hot shingles. ``max_posting_df`` optionally drops
pathologically hot shingles from the B-side index (bounded work at the
cost of recall only for pairs whose ONLY shared prefix shingle is that
hot — the same contract as the LSH bucket cap); with it unset, recall
is 1.0 by construction and the result is the exact containment join.
The verify is pair-bounded (`similarity_dedup._pair_common`) — never an
open self-join over candidate docs' shingles.

Determinism: the threshold is an integer PERCENT and every comparison
is integer cross-multiplied (``100*common >= t_pct*size_a``), so there
is no IEEE ceil anywhere; the emitted ``containment`` column is a raw
IEEE division of two integers, identical in any engine (the q85 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import _pair_common, word_shingles

__all__ = ["containment_pairs"]


def _ceil_pct(pct: int, col):
    """Exact integer ``ceil(pct * col / 100)`` — no doubles involved."""
    return F.floor((F.lit(int(pct)) * col + F.lit(99)) / F.lit(100))


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_pct: int = 90,
    max_posting_df: int | None = None,
) -> DataFrame:
    """Ordered pairs ``(id_a, id_b, common, size_a, size_b,
    containment)`` with ``|A∩B| / |A| >= threshold_pct/100`` over
    n-word shingle sets — id_a is the CONTAINED side. Mutually
    containing near-identical docs appear in both directions, which is
    what an attribution pass wants (each can be collapsed onto the
    other); a subsumed quote appears only as (quote, host)."""
    if not 1 <= int(threshold_pct) <= 100:
        raise ValueError("threshold_pct must be in 1..100")
    sh = word_shingles(df, id_col, text_col, n).localCheckpoint(eager=True)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    # Rare-first prefix per doc in ONE aggregation (the q85 shape):
    # sort_array over collected (df, shingle) structs, then slice —
    # one shuffle on the doc id, no row_number window.
    pref_len = (
        F.size("__arr")
        - _ceil_pct(threshold_pct, F.size("__arr")).cast("int")
        + F.lit(1)
    )
    pref = (
        sh.join(freq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__df", "shingle"))
            ).alias("__arr")
        )
        .select(
            id_col,
            F.size("__arr").cast("long").alias("__sza"),
            F.explode(F.slice("__arr", 1, pref_len)).alias("__s"),
        )
        .select(id_col, F.col("__s.shingle").alias("shingle"), "__sza")
    )
    a = pref.select(F.col(id_col).alias("id_a"), "shingle", "__sza")
    postings = sh.select(F.col(id_col).alias("id_b"), "shingle").join(
        sizes.select(
            F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")
        ),
        "id_b",
    )
    if max_posting_df is not None:
        cool = freq.filter(F.col("__df") <= max_posting_df).select(
            "shingle"
        )
        postings = postings.join(cool, "shingle", "left_semi")
    candidates = (
        a.join(postings, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            F.col("__szb") >= _ceil_pct(threshold_pct, F.col("__sza"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    common = _pair_common(sh, candidates, id_col)
    return (
        common.join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("__sz").alias("size_a")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("__sz").alias("size_b")
            ),
            "id_b",
        )
        .filter(
            F.lit(100) * F.col("common")
            >= F.lit(int(threshold_pct)) * F.col("size_a")
        )
        .select(
            "id_a", "id_b", "common", "size_a", "size_b",
            (
                F.col("common").cast("double")
                / F.col("size_a").cast("double")
            ).alias("containment"),
        )
    )
