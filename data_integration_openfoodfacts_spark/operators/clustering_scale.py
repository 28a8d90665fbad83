"""Warm-start centroid maintenance — the k∝n SemDeDup fit cost,
amortized (round 12).

`clustering.fit_centroids_lloyd` is the GATE fit: deterministic
integer arithmetic a DuckDB oracle replays bit-for-bit, full-batch,
4 iterations. Under the k∝n policy (`similarity.semdedup_k`) its
per-iteration assignment is n*k ~ n²/c — measured 42.7s at 20k
vectors / k=444 (SCALING_LLM.json round12), and it would be run FROM
SCRATCH on every corpus snapshot. Production doesn't refit from
scratch: a growing corpus keeps its previous snapshot's centers,
seeds the k-deficit from the data, and runs one or two refinement
sweeps. These operators ship that path:

- `grow_centroids`: previous centers + (k_target - k_old) seed
  vectors chosen by the engine's data-derived (md5(id), id) order —
  deterministic, engine-portable, no RNG;
- `refine_centroids`: Lloyd sweeps from GIVEN centers, with
  assignment as one GEMM per Arrow batch (`gemm_scan.gemm_assign` —
  the n x k score matrix never exists as Spark rows) and per-cluster
  float means via a (centroid_id, pos) aggregation (k*dim groups,
  map-side combined). Empty clusters keep their previous center.

Scale-path operator, deliberately NOT oracle-gated: float means +
BLAS assignment trade bit-portability for throughput (the same
disclaimer as `gemm_scan`), and the gate queries keep the integer
Lloyd fit. Pinned instead by tests (k preserved, empty-cluster
carry-over, convergence on separable data) and the committed
round-12 probe (full refit vs grow-and-refine wall at 10x, dedup
recall at matched k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grow_centroids", "refine_centroids"]


def grow_centroids(
    embeddings: DataFrame,
    old_centroids: DataFrame,
    k_target: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Seed a k_target-center table from the previous snapshot's
    centers plus (k_target - k_old) corpus vectors, chosen by the
    (md5(id), id) order every engine agrees on (the same seed rule as
    `fit_centroids_lloyd`). New centers take ids k_old..k_target-1.
    Raises when k_target is not above the old center count — shrink
    is a different operation (merge), not a seed."""
    old = old_centroids.select("centroid_id", "centroid_vec")
    k_old = old.count()
    if k_target <= k_old:
        raise ValueError(
            f"k_target={k_target} must exceed the {k_old} existing "
            "centers — grow_centroids only grows"
        )
    seeds = (
        embeddings.select(
            F.col(id_col),
            F.col(vec_col).alias("centroid_vec"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .limit(k_target - k_old)
    )
    from pyspark.sql.window import Window

    new = seeds.select(
        (
            F.row_number().over(
                Window.orderBy(F.col("__h").asc(), F.col(id_col).asc())
            )
            + F.lit(k_old - 1)
        ).cast("long").alias("centroid_id"),
        "centroid_vec",
    )
    return old.unionByName(new)


def refine_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe_blocks: int | None = None,
) -> DataFrame:
    """``n_iters`` Lloyd sweeps from the given centers: GEMM-batched
    max-cosine assignment, then each center moves to its members'
    per-dimension float mean (empty clusters keep their center). One
    localCheckpoint per sweep cuts the iterative lineage; the driver
    never sees data rows — the k x dim mean table stays distributed
    until the final (bounded, k-row) result.

    ``n_probe_blocks`` (round 13): when set, each sweep's assignment
    is the two-level coarse-quantizer probe
    (`coarse_quantizer.blocked_assign`'s kernel with this many probed
    blocks) instead of the flat n×k GEMM — per-sweep work drops from
    n·k to n·√k-ish, the k∝n fit's scale path (VERDICT r12 #1).

    Sweep shape (round 13, second pass): assignment and the mean
    update's partial sums are FUSED into one Arrow pass
    (`coarse_quantizer.assign_mean_partials`) — the old sweep joined
    the n-row assignment back to the corpus (a corpus-sized shuffle
    on both sides) and posexploded n·d mean rows; now each sweep is
    one corpus SCAN emitting ≤ batches×k partial rows, and every
    downstream aggregate is corpus-independent."""
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    from .coarse_quantizer import assign_mean_partials

    cents = centroids.select("centroid_id", "centroid_vec")
    for _ in range(n_iters):
        partials = assign_mean_partials(
            embeddings, cents, n_probe=n_probe_blocks,
            id_col=id_col, vec_col=vec_col,
        )
        # the member count rides the same aggregation: each partial
        # row's n repeats across its pos rows, so per (cid, pos) the
        # summed n IS the centroid's total member count — one
        # consumption of the corpus pass, no second scan, no join
        means = (
            partials.select(
                "centroid_id",
                "n",
                F.posexplode(F.col("sums")).alias("pos", "x"),
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum("x").alias("s"),
                F.sum("n").alias("__N"),
            )
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "s", "__N"))
                ).alias("__ps")
            )
            .select(
                "centroid_id",
                F.transform(
                    "__ps", lambda t: (t["s"] / t["__N"]).cast("float")
                ).alias("__new_vec"),
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("__new_vec", "centroid_vec").alias(
                    "centroid_vec"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return cents
