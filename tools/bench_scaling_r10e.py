"""Scaling probes for the round-10 continuation (third batch)
families: multi-probe LSH retrieval (q186), phrase search (q187) and
the k-core peel (q185).

    python tools/bench_scaling_r10e.py [k] [scratch_dir]

Claims probed (the committed-number discipline of SCALING_LLM.json):

- ``q186_multiprobe_fixed_queries``: a FIXED query workload against a
  kx corpus index — candidates grow with true bucket occupancy (the
  replicas are decorrelated so home buckets stay sparse; growth should
  be mild), and wall should track candidates, not corpus size, because
  the corpus is tagged once (a linear pass) and only matches shuffle.
- ``q187_phrase_scan_linear``: phrase matching is one narrow codegen
  pass over the corpus — wall must grow ~linearly in corpus size and
  is the cheapest of the families by construction.
- ``q185_kcore_rounds_stable``: the peel over a kx near-dup graph —
  wall grows with the pair-join cost (the dominant term), while the
  ROUND COUNT must stay flat (peel depth is a property of graph shape,
  not size; replicas add disjoint components, not depth).

Merges results into SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.operators.kcore import k_core
    from data_integration_openfoodfacts_spark.operators.multiprobe import (
        multiprobe_lsh_cross_candidates,
    )
    from data_integration_openfoodfacts_spark.operators.phrase_search import (
        phrase_topk,
    )
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        ngram_jaccard_pairs,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    res: dict = {}

    # fixed 1x query workload vs THIS scale's corpus index
    base_emb = load_table(spark, SF_DIR, "embeddings")
    q = base_emb.filter(F.col("vec_id") % 23 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    ).localCheckpoint(eager=True)
    c = emb.filter(F.col("vec_id") % 23 != 0).select(
        F.col("vec_id").alias("c_id"), "embedding"
    )
    cand = multiprobe_lsh_cross_candidates(
        q, c, 64, rows_per_band=8, num_bands=4
    )
    res["multiprobe"] = {
        "sec": time_df(lambda: cand),
        "candidates": cand.count(),
    }

    res["phrase"] = {
        "sec": time_df(
            lambda: phrase_topk(
                docs, "doc_id", "text",
                ["table scan", "hash join", "sort merge"], 10,
            )
        )
    }

    import time as _t

    edges = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2
    ).select("id_a", "id_b")
    t0 = _t.time()
    core, rounds = k_core(edges, "id_a", "id_b", k=2)
    n = core.count()
    res["kcore"] = {
        "sec": round(_t.time() - t0, 2),
        "rounds": rounds,
        "core_nodes": n,
    }
    return res


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="r10e_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark()
    big_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, big_dir, k)
    base = probe(spark, SF_DIR)
    big = probe(spark, big_dir)
    out = {
        "q186_multiprobe_fixed_queries": {
            "base_sec": base["multiprobe"]["sec"],
            f"x{k}_sec": big["multiprobe"]["sec"],
            "growth": round(
                big["multiprobe"]["sec"]
                / max(base["multiprobe"]["sec"], 1e-9), 2
            ),
            "base_candidates": base["multiprobe"]["candidates"],
            f"x{k}_candidates": big["multiprobe"]["candidates"],
        },
        "q187_phrase_scan_linear": {
            "base_sec": base["phrase"]["sec"],
            f"x{k}_sec": big["phrase"]["sec"],
            "growth": round(
                big["phrase"]["sec"] / max(base["phrase"]["sec"], 1e-9), 2
            ),
        },
        "q185_kcore_rounds_stable": {
            "base_sec": base["kcore"]["sec"],
            f"x{k}_sec": big["kcore"]["sec"],
            "growth": round(
                big["kcore"]["sec"] / max(base["kcore"]["sec"], 1e-9), 2
            ),
            "rounds_base": base["kcore"]["rounds"],
            f"rounds_x{k}": big["kcore"]["rounds"],
            "core_nodes_base": base["kcore"]["core_nodes"],
            f"core_nodes_x{k}": big["kcore"]["core_nodes"],
        },
    }
    path = os.path.join(REPO, "SCALING_LLM.json")
    data = json.load(open(path))
    data["queries"].update(out)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
