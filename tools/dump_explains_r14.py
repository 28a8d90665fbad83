"""Dump `.explain("formatted")` for the round-14-touched queries into
plans/r14/<qN>_<tag>.txt (the optimization-round plan evidence).

    python tools/dump_explains_r14.py <tag> [outdir] [query ...]

``tag`` is ``before`` (run from a scratch worktree of the round-13
close-out commit 2cfa146) or ``after`` (run at round-14 HEAD). Queries
default to the round-14-touched set. Lifecycle queries execute their
store actions at sf0.001 while building the returned frame; the dumped
plan is the final declared frame's — the same one the bench noop-sinks
(for the eagerly-checkpointed lifecycle frames that plan is a trivial
RDD scan; the meaningful shapes are the operator-level dumps this
script also emits on the ``after`` side, plus the plan-shape tests).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

DEFAULT_QUERIES = [
    "q171_binary_simhash",
    "q176_counting_bloom_takedown",
    "q200_incremental_components",
    "q42_duplicate_clusters",
    "q178_counting_store_takedown",
    "q179_counting_store_time_travel",
    "q199_takedown_request_idempotence",
    "q201_component_ledger_lifecycle",
    "q202_neardup_ingest_component_lifecycle",
    "q203_component_ledger_takedown",
]


def _dump(df, outdir: str, stem: str, tag: str, note: str) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{stem}_{tag}.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"# {note} — explain('formatted') at sf0.001 [{tag}]\n")
        f.write(buf.getvalue())
    print(f"wrote {path}")


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/plans/r14"
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)

    from data_integration_openfoodfacts_spark.plans.registry import QUERIES
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("explain-r14")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not in this revision's registry")
            continue
        df = QUERIES[name](spark, SF_DIR)
        _dump(df, outdir, name.split("_", 1)[0], tag, name)

    if tag != "after":
        return

    # operator-level evidence (round-14 code only): the merge's fused
    # read side and the hybrid CC output shape
    import tempfile

    from pyspark.sql import functions as F

    from data_integration_openfoodfacts_spark.functions.localframe import (
        local_rows_df,
    )
    from data_integration_openfoodfacts_spark.operators import (
        component_ledger as cl,
    )
    from data_integration_openfoodfacts_spark.operators.bucketed_ledger import (  # noqa: E501
        prune_to_buckets,
    )
    from data_integration_openfoodfacts_spark.operators.graph import (
        connected_components,
    )

    tmp = tempfile.mkdtemp(prefix="r14dump_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    labels = docs.select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") - F.col("doc_id") % 10).alias("component"),
    )
    cl.init_component_ledger(labels, tmp, n_buckets=8)
    eps = [0, 10, 20]
    ep_df = local_rows_df(spark, [(n,) for n in eps], "node long")
    nbs = sorted({cl._nb_of_py(n, 8) for n in eps})
    store = prune_to_buckets(
        cl._read_store(spark, tmp), cl.NB_COL, nbs
    ).select("node", "component")
    probe = store.join(F.broadcast(ep_df), "node", "left_semi").select(
        F.lit(0).alias("__t"), F.col("node").alias("__a"),
        F.col("component").alias("__b"),
    )
    alias_rows = cl._read_alias(spark, tmp).select(
        F.lit(1).alias("__t"), F.col("old").alias("__a"),
        F.col("new").alias("__b"),
    )
    _dump(
        probe.unionByName(alias_rows), outdir, "merge_read", tag,
        "merge_ledger_components fused probe∪alias read (bucket-pruned "
        "explicit-schema scan, broadcast-TRANCHE semi, one collect)",
    )

    edges_path = f"{tmp}/edges"
    docs.select(
        F.col("doc_id").alias("u"), (F.col("doc_id") % 97).alias("v")
    ).write.parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    _dump(
        connected_components(edges, "u", "v"), outdir, "cc_hybrid", tag,
        "connected_components hybrid output (driver union-find labels "
        "as a local frame + broadcast anti-join for isolated nodes — "
        "no iterative star-contraction lineage)",
    )


if __name__ == "__main__":
    main()
