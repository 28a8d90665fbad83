"""Integer-weighted MinHash (consistent weighted sampling by element
replication) — the tf-aware twin of the set-Jaccard LSH family.

Plain MinHash (`similarity_dedup.minhash_band_signatures`, q19) treats
a document as a SET: "the the the cat" and "the cat" are identical.
Weighted Jaccard J_W(A,B) = sum_t min(a_t, b_t) / sum_t max(a_t, b_t)
over tf vectors is the multiset-faithful similarity, and Ioffe's ICWS
is its classic sketch — but ICWS draws log-gamma / exponential floats
per (element, hash), and transcendental libm results are NOT
bit-portable across engines (this repo's determinism contract,
CLAUDE.md: never hash a double both engines must agree on beyond one
IEEE operation). Design decision, recorded: for INTEGER weights —
and tf weights are integers — consistent weighted sampling is EXACT
without any float: replicate element t into rows (t#0 .. t#w-1) and
min-hash the expanded multiset. Two documents share replica (t, j)
iff both have tf >= j+1, so the expanded sets' plain Jaccard IS the
weighted Jaccard, every hash stays md5-derived integer arithmetic mod
P, and a SQL oracle replays the sketch verbatim (q177). ICWS would
only be needed for REAL-valued weights; the rejection note lives here
so the next round doesn't re-derive it.

``cap`` bounds replication (default 8): a token repeated 10,000 times
otherwise expands 10,000 rows. Capping computes J_W over min(tf, cap)
vectors — the standard sublinear-tf damping (same spirit as q174's
1+log2 SimHash weighting), applied identically on both engines.

Scale shape (100 TB argument): the expansion is O(total capped
tokens) ~ O(corpus tokens) narrow rows, ONE md5 per replica with the
num_hashes permutations derived arithmetically (universal hashing —
same trick as the unweighted family), all minima out of a single
groupBy(id), banding per-document cardinality, one shuffle on (band,
sig), hot template buckets dropped by ``max_bucket_size`` (a size-m
bucket is m^2/2 pairs; true clusters that large re-surface through
their other bands), and the exact-J_W verify joins through the
candidate PAIR table only — never an open token self-join.

Reference parity: extends Sevlac/data-integration-openfoodfacts's
dedup needs (notebook keep-latest, `pipeline_etl.ipynb`) the same way
q19/q85 do — corpus-scale near-dup detection the notebook never had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import MINHASH_P, md5_long, minhash_params

__all__ = [
    "token_tf",
    "weighted_minhash_band_signatures",
    "weighted_minhash_pairs",
    "verify_weighted_jaccard",
]


def token_tf(
    df: DataFrame, id_col: str, text_col: str, cap: int = 8
) -> DataFrame:
    """(id, tok, ctf): capped whitespace-token term frequencies —
    the integer weight vector everything downstream consumes. Empty
    tokens (consecutive spaces) are dropped, matching the tokenizer
    family's convention."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.groupBy(id_col, "tok").agg(
        F.least(F.count(F.lit(1)), F.lit(cap)).alias("ctf")
    )


def weighted_minhash_band_signatures(
    tf: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 4,
) -> DataFrame:
    """(id, band, sig) over the replicated multiset: row (tok, j) for
    j in [0, ctf) hashes as md5(tok || '#' || j) — one md5 per replica,
    permutations j=0..num_hashes-1 derived arithmetically, all minima
    aggregated in ONE groupBy(id) (no num_hashes-way row explosion
    through the shuffle)."""
    if num_hashes % band_size != 0:
        raise ValueError("num_hashes must be a multiple of band_size")
    a_c, b_c = minhash_params(num_hashes)
    expanded = tf.select(
        F.col(id_col),
        F.col("tok"),
        F.explode(F.sequence(F.lit(0), F.col("ctf") - 1)).alias("j"),
    ).select(
        F.col(id_col),
        F.concat(
            F.col("tok"), F.lit("#"), F.col("j").cast("string")
        ).alias("replica"),
    )
    h0 = md5_long(F.col("replica")) % F.lit(MINHASH_P)
    mins = expanded.select(F.col(id_col), h0.alias("h0")).groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(a_c[j]) * F.col("h0") + F.lit(b_c[j]))
                % F.lit(MINHASH_P)
            ).alias(f"m{j}")
            for j in range(num_hashes)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{k * band_size + i}").cast("string")
                        for i in range(band_size)
                    ],
                ).alias("sig"),
            )
            for k in range(num_hashes // band_size)
        ]
    )
    return mins.select(
        F.col(id_col), F.explode(band_structs).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def weighted_minhash_pairs(
    tf: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 4,
    max_bucket_size: int | None = 16,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, nb_bands) agreeing on a full band
    of weighted min-hashes. Unigram signatures bucket template-heavy
    corpora aggressively (measured: uncapped 2x4 banding yielded 495k
    candidate pairs over 5k sf0.1 docs; max_bucket_size=16 cuts that
    to ~9k while keeping every verified >=0.7 cluster reachable), so
    the bucket cap defaults ON here unlike the shingle family."""
    bands = weighted_minhash_band_signatures(
        tf, id_col, num_hashes, band_size
    )
    if max_bucket_size is not None:
        small = (
            bands.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("m"))
            .filter(F.col("m") <= max_bucket_size)
            .select("band", "sig")
        )
        bands = bands.join(small, ["band", "sig"], "left_semi")
    a = bands.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("band").cast("long").alias("nb_bands"))
    )


def verify_weighted_jaccard(
    tf: DataFrame,
    candidates: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact weighted Jaccard over candidate pairs, candidate-bounded:
    the intersection sum(min(ctf_a, ctf_b)) joins THROUGH the pair
    table (never an open token self-join), sizes come from per-doc
    sum(ctf), and J_W = inter / (sz_a + sz_b - inter) is one IEEE
    division of exact integers — bit-identical on any engine.
    Columns: id_a, id_b, w_jaccard (only pairs >= threshold)."""
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    tf_c = tf.join(cand_ids, id_col, "left_semi")
    sizes = tf_c.groupBy(id_col).agg(F.sum("ctf").alias("sz"))
    a = tf_c.select(
        F.col(id_col).alias("id_a"), "tok", F.col("ctf").alias("ctf_a")
    )
    b = tf_c.select(
        F.col(id_col).alias("id_b"), "tok", F.col("ctf").alias("ctf_b")
    )
    inter = (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["tok", "id_b"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ctf_a", "ctf_b")).alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("w_jaccard"),
        )
        .filter(F.col("w_jaccard") >= threshold)
    )
