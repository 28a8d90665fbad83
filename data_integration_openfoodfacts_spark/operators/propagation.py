"""Semi-supervised label propagation over a similarity graph — the
curation move where a few trusted quality labels (human audits, a
slow-teacher model run on 0.1% of the corpus) EXPAND through the
near-duplicate/similarity structure to label everything connected:
near-identical documents should carry near-identical quality verdicts,
so the graph the dedup family already builds (q18/q19 pairs) does the
labeling work for free.

Synchronous Jacobi iteration with CLAMPED SEEDS (the classic
Zhu-Ghahramani harmonic shape): unlabeled nodes move to the mean of
their neighbours' current labels; seed nodes never move. ALL-INTEGER
arithmetic — labels live in micros and updates are ``SUM DIV COUNT``
floor divisions — so every engine replays the trajectory bit-for-bit
(the q104 PageRank portability trick; float propagation would drift by
summation order and be unverifiable across engines).

Scale shape: per iteration ONE hash join of the (symmetrized,
checkpointed) edge list with the O(nodes) state — broadcast when the
state is small, AQE-demoted otherwise — plus one groupBy(node)
mean with map-side partial aggregation. The edge list is materialized
once and never rebuilt; lineage is cut per iteration (the iterative-
Spark trap). Deterministic: each round's state is a pure function of
(edges, previous state) — no ordering or partitioning effects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRIOR_MICROS = 500_000  # uninformative 0.5 prior for unlabeled nodes


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 2,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "node",
    label_col: str = "label_micros",
    prior_micros: int = PRIOR_MICROS,
) -> DataFrame:
    """Expand ``seeds`` (node, label_micros) over the undirected
    ``edges`` for ``n_iters`` synchronous rounds. Returns
    (node, label_micros, is_seed) for every node that appears in the
    graph or the seed set: seeds keep their label verbatim; other
    nodes hold FLOOR(mean of neighbour labels) from the last round
    (their ``prior_micros`` start if the graph never reaches them).

    ``n_iters`` bounds information radius, not convergence — labels
    reach n_iters hops from a seed, which is the behaviour a curation
    pass wants (an unlabeled island far from any audit should keep the
    prior, not inherit a label through a 40-hop chain of weak
    near-dup links)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_tbl = seeds.select(
        F.col(node_col).alias("node"),
        F.col(label_col).cast("long").alias("seed_lab"),
    )
    nodes = (
        sym.select(F.col("u").alias("node"))
        .union(sym.select(F.col("v").alias("node")))
        .union(seed_tbl.select("node"))
        .distinct()
    )
    state = nodes.join(seed_tbl, "node", "left").select(
        "node",
        F.coalesce("seed_lab", F.lit(prior_micros)).cast("long").alias("lab"),
        F.col("seed_lab").isNotNull().alias("is_seed"),
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        nbr = (
            sym.join(state, sym["v"] == state["node"])
            .groupBy("u")
            .agg(
                # SUM DIV COUNT: floor division is the one spelling of
                # an integer mean every engine reproduces exactly
                F.expr("sum(lab) DIV count(1)").alias("nbr_mean")
            )
        )
        state = (
            state.join(nbr, state["node"] == nbr["u"], "left")
            .select(
                "node",
                F.when(F.col("is_seed"), F.col("lab"))
                .otherwise(F.coalesce("nbr_mean", F.col("lab")))
                .cast("long")
                .alias("lab"),
                "is_seed",
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        F.col("node").alias(node_col),
        F.col("lab").alias(label_col),
        "is_seed",
    )
