"""Warm-start vs from-scratch centroid fit at 10x (round 12).

The k∝n SemDeDup policy's fit cost objection, answered with a
measurement: a corpus that grew 1x -> 10x does NOT refit k=444
centers from scratch (full integer Lloyd, 4 sweeps, n*k per sweep —
the SCALING_LLM round12 `kpropn_x10.fit_sec`); it GROWS the previous
snapshot's 44 centers with md5-ordered seeds and runs one or two
GEMM-assigned refinement sweeps (`operators/clustering_scale.py`).
This probe records both fit walls AND the dedup quality under each
center set (dups found + absolute recall vs the same brute-force
numpy truth as bench_scaling_r12), so the speedup is shown at matched
duty, not just matched k.

    python tools/bench_warmfit_r12.py [K] [probe_dir]
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


def truth_dups(emb_df, threshold=0.35):
    rows = emb_df.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )
    n = np.linalg.norm(M, axis=1)
    Mn = M / np.where(n == 0.0, 1.0, n)[:, None]
    dup = np.zeros(len(ids), dtype=bool)
    for s in range(0, len(ids), 2048):
        S = Mn[s : s + 2048] @ Mn.T
        for i in range(S.shape[0]):
            gi = s + i
            if gi == 0 or n[gi] == 0.0:
                continue
            row = S[i, :gi]
            if np.any(row[n[:gi] > 0.0] >= threshold):
                dup[gi] = True
    return {int(v) for v in ids[dup]}


def dedup_quality(emb, cents, truth):
    from pyspark.sql import functions as F

    from data_integration_openfoodfacts_spark.operators.similarity import (
        semantic_dedup,
    )

    t0 = time.time()
    out = semantic_dedup(
        emb, cents, threshold=0.35, gemm_assignment=True
    ).localCheckpoint(eager=True)
    sec = round(time.time() - t0, 2)
    found = {
        int(r["vec_id"])
        for r in out.filter(~F.col("kept")).select("vec_id").collect()
    }
    recall = round(len(found & truth) / len(truth), 4) if truth else None
    return {"dedup_sec": sec, "n_dups": len(found), "recall": recall}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probe_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="warmfit_")
    )
    own_tmp = len(sys.argv) <= 2

    from data_integration_openfoodfacts_spark.operators.clustering import (
        fit_centroids_lloyd,
    )
    from data_integration_openfoodfacts_spark.operators.clustering_scale import (  # noqa: E501
        grow_centroids,
        refine_centroids,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        semdedup_k,
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark(
        "warmfit12",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/warmfit12wh",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, SF_DIR, probe_dir, k)
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embK = spark.read.parquet(f"{probe_dir}/embeddings.parquet")
    e1, eK = emb1.count(), embK.count()
    k1, kK = semdedup_k(e1), semdedup_k(eK)

    # previous snapshot's centers (the warm-start input): full fit at
    # the base corpus — this cost was paid LAST snapshot, not now
    prev = fit_centroids_lloyd(emb1, k=k1).localCheckpoint(eager=True)
    prev.count()

    res = {"k": k, "base_vectors": e1, "big_vectors": eK,
           "k_base": k1, "k_big": kK}

    t0 = time.time()
    cold = fit_centroids_lloyd(embK, k=kK).localCheckpoint(eager=True)
    cold.count()
    res["cold_full_fit_sec"] = round(time.time() - t0, 2)

    for iters in (1, 2):
        t0 = time.time()
        warm = refine_centroids(
            embK, grow_centroids(embK, prev, k_target=kK), n_iters=iters
        )
        warm.count()  # already checkpointed per sweep; count = settle
        res[f"warm_grow_refine{iters}_sec"] = round(time.time() - t0, 2)
        if iters == 1:
            warm1 = warm

    truth = truth_dups(embK)
    res["truth_dups"] = len(truth)
    res["quality_cold"] = dedup_quality(embK, cold, truth)
    res["quality_warm1"] = dedup_quality(embK, warm1, truth)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    merged = json.load(open(out_path))
    merged.setdefault("round12", {})["warmfit"] = res
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))
    if own_tmp:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
