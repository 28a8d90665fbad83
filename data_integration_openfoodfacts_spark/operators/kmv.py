"""KMV (bottom-k / K-Minimum-Values) distinct sketch — the mergeable
cardinality sketch that, unlike HLL (functions/sketches.py's q136
path), also supports SET INTERSECTION and Jaccard estimation
(Beyer et al. 2007, "On Synopses for Distinct-Value Estimation under
Multiset Operations"). The 100 TB planning question it answers
cheaply: "how much does crawl snapshot B overlap snapshot A?" —
without the exact anti-join the novelty ledger pays only for admitted
data.

Sketch = the k smallest DISTINCT md5-derived hash values of the set.
Estimators (exact integer/double arithmetic, engine-portable):

- distinct count:  (k - 1) * M / h_k   where h_k is the k-th smallest
  hash and M the hash-space size (2^60 for the engine's 15-hex-digit
  md5_long — every value exactly representable in double);
- union: the k smallest of the merged sketches IS the KMV sketch of
  the union (exact identity, pinned by test) — estimate as above;
- Jaccard: the fraction of the union sketch's members present in BOTH
  input sketches (each membership exact — the sketches are sets);
- intersection: jaccard_est * union_est.

Spark-first shape: ONE narrow hash projection + distinct + a k-row
TakeOrderedAndProject per set; every later step operates on <= k-row
frames. Deterministic by construction — a DuckDB twin replays the
same mins, so the sketch itself is value-hash-oracleable (q162), with
accuracy-vs-exact pinned separately in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import md5_long

#: md5_long draws 15 hex digits = 60 bits; 2^60 is exactly
#: representable in double, so (k-1) * M / h_k is one IEEE division in
#: both engines.
KMV_M = float(1 << 60)


def kmv_sketch(df: DataFrame, element: Column | str, k: int) -> DataFrame:
    """The k smallest distinct ``md5_long(element)`` values: (h long).
    One distinct + TakeOrdered; the result is a <= k-row frame.

    NULL elements are excluded from the sketch (the SQL COUNT DISTINCT
    convention). This is load-bearing for cross-engine parity: a NULL
    element hashes to a NULL h, which Spark's ascending sort places
    FIRST (entering the k minima and inflating n_mins) but DuckDB
    places LAST — without the filter a nullable element column would
    silently corrupt the sketch on exactly one engine (round-7
    ADVICE)."""
    col = F.col(element) if isinstance(element, str) else element
    # md5_long is 15 hex digits, i.e. already < 2^60 = KMV_M
    return (
        df.select(md5_long(col).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_union(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """KMV sketch of the UNION of the underlying sets — exactly the k
    smallest of the merged sketch members (identity pinned by test)."""
    return (
        sketch_a.unionByName(sketch_b).distinct().orderBy("h").limit(k)
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """(n_mins, kth_hash, est_distinct): the (k-1)*M/h_k estimator.
    A sketch holding fewer than k values saw the WHOLE set — the
    estimate is then the exact count."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_mins"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_mins",
        "kth_hash",
        F.when(F.col("n_mins") < k, F.col("n_mins").cast("double"))
        .otherwise(
            (F.lit(float(k - 1)) * F.lit(KMV_M))
            / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )


def kmv_jaccard(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int
) -> DataFrame:
    """(union_k, n_both, jaccard_est): fraction of the union sketch's
    members present in both input sketches. All <= k-row work."""
    u = kmv_union(sketch_a, sketch_b, k)
    both = (
        u.join(sketch_a, "h", "left_semi")
        .join(sketch_b, "h", "left_semi")
    )
    return u.agg(F.count(F.lit(1)).alias("union_k")).crossJoin(
        both.agg(F.count(F.lit(1)).alias("n_both"))
    ).select(
        "union_k",
        "n_both",
        (
            F.col("n_both").cast("double")
            / F.col("union_k").cast("double")
        ).alias("jaccard_est"),
    )
