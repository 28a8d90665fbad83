"""Collision EDGES against a persisted band ledger — the bridge from
incremental MinHash matching (q128's operator family) to incremental
connected components (round 13, VERDICT r12 #4).

`similarity_dedup.collision_ids` answers "WHICH batch docs collide"
(the dedup-drop shape). A clustering ingest needs "WITH WHOM": edges
feeding `component_ledger.merge_ledger_components`. Emitting every
colliding (new, old) pair would re-open the hot-bucket m²/2 blowup
q151 closed — so this emits the STAR shape instead: per colliding
(band, sig) group, each new doc links to

- the MIN-id ledger doc of that group (one edge per new band row that
  collides with the corpus), and
- the MIN-id same-batch doc of that group (the q151 intra-bucket
  star).

Connectivity is exactly the all-pairs graph's: every member of a
(band, sig) group ends up connected through the group's minimum —
earlier tranches connected it when THEY arrived (induction the q202
oracle checks end-to-end against a from-scratch recursive walk), and
no star edge joins docs that don't share a signature. Edge count is
O(|batch band rows|), never O(group²).

Join direction is the ledger rule (broadcast-TRANCHE): the ledger is
scanned with the batch's bounded (band, sig) keys broadcast, then the
per-group minima — bounded by the batch's signature count — broadcast
back onto the batch. The ledger is never shuffled or broadcast;
the only aggregation shuffles colliding ledger rows (map-side
combined min). Sentinel rows (band = -1, the ingest heal's marker for
unshingleable docs) never collide: real signatures never use band -1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["collision_star_edges"]


def collision_star_edges(
    new_bands: DataFrame,
    ledger_bands: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(u, v) star edges for a batch's band signatures against a band
    ledger: u = the batch doc, v = the (band, sig) group's min-id
    ledger doc or min-id earlier batch doc. Both inputs are
    (id_col, band, sig); pass the ledger PRUNED to the batch's touched
    buckets (`bucketed_ledger.prune_to_buckets`) so the scan prunes at
    file-listing level — this function keeps whatever scan it is
    given."""
    batch_sigs = new_bands.select("band", "sig").distinct()
    hit_min = (
        ledger_bands.select(id_col, "band", "sig")
        .join(F.broadcast(batch_sigs), ["band", "sig"], "left_semi")
        .groupBy("band", "sig")
        .agg(F.min(id_col).alias("__v"))
    )
    vs_ledger = (
        new_bands.join(F.broadcast(hit_min), ["band", "sig"])
        .select(F.col(id_col).alias("u"), F.col("__v").alias("v"))
    )
    w = Window.partitionBy("band", "sig")
    vs_batch = (
        new_bands.withColumn("__root", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__root"))
        .select(F.col(id_col).alias("u"), F.col("__root").alias("v"))
    )
    return (
        vs_ledger.unionByName(vs_batch)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
