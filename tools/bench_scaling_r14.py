"""Round-14 scaling probe: the blocked-probe SCHEDULE sweep
(VERDICT r13 #5) — n_probe x n_blocks at 50x corpus, agreement vs the
flat GEMM assignment, wall, and exact scored-centers-per-vector work;
plus SemDeDup dedup duty (blocked dups / flat dups at the same
threshold) at 10x for the chosen operating point.

Writes SCALING_LLM.json under "round14".

    python tools/bench_scaling_r14.py [K] [probe_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate  # noqa: E402
from tools.bench_warmfit_r12 import dedup_quality, truth_dups  # noqa: E402


def _blocked_work_per_point(k: int, n_probe: int, n_blocks=None) -> float:
    B = int(np.ceil(np.sqrt(n_probe * k))) if n_blocks is None else n_blocks
    B = max(1, min(B, k))
    return B + min(n_probe, B) * (k / B)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probe_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="r14probe_")
    )
    own_tmp = len(sys.argv) <= 2

    from pyspark.sql import functions as F

    from data_integration_openfoodfacts_spark.operators.coarse_quantizer import (  # noqa: E501
        blocked_assign,
        fit_centroids_blocked,
    )
    from data_integration_openfoodfacts_spark.operators.gemm_scan import (
        gemm_assign,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        semdedup_k,
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark(
        "r14probe",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/r14probewh",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, SF_DIR, probe_dir, k)
    embK = spark.read.parquet(f"{probe_dir}/embeddings.parquet")
    big_dir = os.path.join(probe_dir, "x50")
    replicate(spark, SF_DIR, big_dir, 5 * k)
    emb50 = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    eK, e50 = embK.count(), emb50.count()
    kk50 = semdedup_k(e50)

    # one center set for the whole sweep: the schedule is the variable
    cents50 = fit_centroids_blocked(
        emb50, kk50, n_iters=1, n_probe=8
    ).localCheckpoint(eager=True)
    cents50.count()

    t0 = time.time()
    gemm_assign(emb50, cents50).localCheckpoint(eager=True).count()
    flat_sec = round(time.time() - t0, 2)
    flat_ids = (
        gemm_assign(emb50, cents50)
        .withColumnRenamed("centroid_id", "flat_cid")
        .localCheckpoint(eager=True)
    )

    default_B = int(np.ceil(np.sqrt(8 * kk50)))
    sweep = []
    for n_probe in (4, 8, 16, 32, 64):
        for B in sorted({default_B, 2 * default_B, 4 * default_B}):
            t0 = time.time()
            assigned = blocked_assign(
                emb50, cents50, n_probe, n_blocks=B
            ).localCheckpoint(eager=True)
            n_assigned = assigned.count()
            wall = round(time.time() - t0, 2)
            agree = (
                assigned.join(flat_ids, "vec_id")
                .filter(F.col("centroid_id") == F.col("flat_cid"))
                .count()
            )
            sweep.append(
                {
                    "n_probe": n_probe,
                    "n_blocks": B,
                    "wall_sec": wall,
                    "agreement": round(agree / n_assigned, 4),
                    "scored_centers_per_vec": round(
                        _blocked_work_per_point(kk50, n_probe, B), 1
                    ),
                }
            )
            print(sweep[-1], flush=True)

    # operating point: cheapest schedule with agreement >= 0.95
    ok = [s for s in sweep if s["agreement"] >= 0.95]
    chosen = (
        min(ok, key=lambda s: s["scored_centers_per_vec"])
        if ok
        else max(sweep, key=lambda s: s["agreement"])
    )

    # dedup duty at 10x for the chosen point (truth is brute-force
    # numpy over the 10x corpus — 50x truth is O(n^2) infeasible)
    kk10 = semdedup_k(eK)
    cents10 = fit_centroids_blocked(
        embK, kk10, n_iters=1, n_probe=chosen["n_probe"]
    ).localCheckpoint(eager=True)
    cents10.count()
    truth = truth_dups(embK)
    q_flat = dedup_quality(embK, cents10, truth)
    from data_integration_openfoodfacts_spark.operators.similarity import (
        semantic_dedup,
    )

    t0 = time.time()
    blk_out = semantic_dedup(
        embK, cents10, threshold=0.35,
        blocked_probe=chosen["n_probe"],
    ).localCheckpoint(eager=True)
    blk_sec = round(time.time() - t0, 2)
    blk_found = {
        int(r["vec_id"])
        for r in blk_out.filter(~F.col("kept")).select("vec_id").collect()
    }
    duty = round(len(blk_found) / max(1, q_flat["n_dups"]), 4)
    blk_recall = (
        round(len(blk_found & truth) / len(truth), 4) if truth else None
    )
    res = {
        "vectors_x50": e50,
        "k_x50": kk50,
        "gemm_assign_sec_x50": flat_sec,
        "default_n_blocks": default_B,
        "schedule_sweep_x50": sweep,
        "chosen": chosen,
        "x10_quality_flat": q_flat,
        "x10_quality_blocked": {
            "dedup_sec": blk_sec,
            "n_dups": len(blk_found),
            "recall": blk_recall,
        },
        "x10_blocked_duty_vs_flat": duty,
    }

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    doc = json.load(open(path))
    doc["round14"] = res
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(res, indent=1)[:2000])
    if own_tmp:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
