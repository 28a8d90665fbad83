"""Throughput probe: batched-GEMM brute-force top-k
(`operators/gemm_scan.py`) vs the per-pair Arrow fold
(`functions/vectors.pair_dot_fold`) on the same exact scan.

    python tools/bench_scaling_gemm.py [k_replication] [scratch_dir]

Claim probed: both paths do the same multiply-adds, but the GEMM path
scores a whole Arrow batch as one BLAS call and shuffles only k
batch-local winners per query, while the per-pair path materializes
every (query, corpus) pair row first — so at brute-force scale the
GEMM path should win by an order of magnitude and the gap should WIDEN
with corpus size. Merges results into SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K_TOP = 10
QMOD = 23


def _queries(spark):
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    return (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % QMOD == 0)
        .select(F.col("vec_id").alias("q_id"), "embedding")
        .localCheckpoint(eager=True)
    )


def probe(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.functions.vectors import (
        l2_norm_expr,
        pair_dot_fold,
    )
    from data_integration_openfoodfacts_spark.operators.gemm_scan import (
        gemm_topk,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(spark)
    n_pairs = emb.count() * q.count()

    def run(mk):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    gemm_sec = run(lambda: gemm_topk(emb, q, k=K_TOP))

    qa = q.select(
        "q_id",
        F.col("embedding").alias("__va"),
        l2_norm_expr("embedding").alias("__na"),
    )

    def fold():
        pairs = (
            emb.select(
                F.col("vec_id").alias("c_id"),
                F.col("embedding").alias("__vb"),
                l2_norm_expr("embedding").alias("__nb"),
            )
            .crossJoin(F.broadcast(qa))
            .filter(F.col("c_id") != F.col("q_id"))
            .select(
                "q_id", "c_id",
                F.coalesce(
                    F.try_divide(
                        pair_dot_fold("__va", "__vb"),
                        F.col("__na") * F.col("__nb"),
                    ),
                    F.lit(-2.0),
                ).alias("cosine"),
            )
        )
        return pairs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cosine"), F.asc("c_id")
                )
            ),
        ).filter(F.col("rk") <= K_TOP)

    fold_sec = run(fold)
    return {"gemm_sec": gemm_sec, "fold_sec": fold_sec,
            "pairs": int(n_pairs)}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="gemm_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, big_dir, k)
    base = probe(spark, SF_DIR)
    big = probe(spark, big_dir)
    sfx = "" if k == 10 else f"_k{k}"
    out = {
        f"gemm_vs_pairfold_brute_topk{sfx}": {
            "queries": "vec_id % 23 == 0 (1x workload)",
            "base_pairs": base["pairs"],
            f"x{k}_pairs": big["pairs"],
            "base_gemm_sec": base["gemm_sec"],
            "base_fold_sec": base["fold_sec"],
            f"x{k}_gemm_sec": big["gemm_sec"],
            f"x{k}_fold_sec": big["fold_sec"],
            "base_speedup": round(
                base["fold_sec"] / max(base["gemm_sec"], 1e-9), 2
            ),
            f"x{k}_speedup": round(
                big["fold_sec"] / max(big["gemm_sec"], 1e-9), 2
            ),
        }
    }
    path = os.path.join(REPO, "SCALING_LLM.json")
    with open(path) as f:
        rec = json.load(f)
    rec["queries"].update(out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
