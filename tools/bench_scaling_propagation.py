"""10x scale point for label propagation (q172 — round-11 candidate #4
landed in round 10): the edge BUILD is already probed by
q151_leakage_cc; this measures the propagation rounds themselves
(state join + grouped floor-mean, 2 iterations) over checkpointed
edges, so the number isolates the operator from the pair generation.

    python tools/bench_scaling_propagation.py [k]

Merges `q172_propagation_rounds_k{k}` into SCALING_LLM.json.
"Candidates" = symmetrized edge rows the rounds actually consume.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.operators.propagation import (
        propagate_labels,
    )
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        ngram_jaccard_pairs,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    seeds = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("node"),
        ((F.col("doc_id") % 2) * 1_000_000).cast("long").alias(
            "label_micros"
        ),
    ).localCheckpoint(eager=True)
    return {
        "sec": time_df(lambda: propagate_labels(pairs, seeds, n_iters=2)),
        "candidates": 2 * pairs.count(),
    }


def main() -> None:
    from data_integration_openfoodfacts_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("bench-scaling-propagation")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="scaleprobe_prop_")
    print(f"replicating docs {k}x -> {scratch}", file=sys.stderr)
    replicate(spark, SF_DIR, scratch, k)
    b, g = probe(spark, SF_DIR), probe(spark, scratch)
    entry = {
        "base_sec": b["sec"],
        f"x{k}_sec": g["sec"],
        "growth": round(g["sec"] / b["sec"], 2) if b["sec"] else None,
        "base_candidates": b["candidates"],
        f"x{k}_candidates": g["candidates"],
        "cand_growth": round(g["candidates"] / b["candidates"], 2)
        if b["candidates"]
        else None,
    }
    record = os.path.join(REPO, "SCALING_LLM.json")
    with open(record) as f:
        full = json.load(f)
    full["queries"][f"q172_propagation_rounds_k{k}"] = entry
    with open(record, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps({f"q172_propagation_rounds_k{k}": entry}))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
