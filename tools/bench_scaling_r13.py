"""Round-13 scaling probes: the coarse-quantizer fit (VERDICT r12 #1)
and the k∝n recall-vs-cluster-size curve (VERDICT r12 #3).

Three sections, written to SCALING_LLM.json under "round13":

- ``assign_scaling``: the ASSIGNMENT stage isolated (the n×k term the
  blocked probe breaks) — wall of `gemm_scan.gemm_assign` vs
  `coarse_quantizer.blocked_assign` at 10× and 50× corpus with
  k = n/45, plus the exact per-sweep distance-work counts (flat n·k·d
  vs blocked n·(B + m·⌀block)·d) so the asymptote is visible even
  where BLAS parallelism hides it in wall time, plus the agreement
  fraction between the two assignments.
- ``fit_scaling``: cold end-to-end fit wall (md5 seeds + 2 refine
  sweeps) flat vs blocked at 1× and 10×, with SemDeDup dedup quality
  under each center set at 10× — the ≥95%-of-full-assignment-quality
  criterion, measured at matched duty.
- ``c_sweep``: the k∝n policy's cluster-size knob at 10×: for
  c ∈ {25, 45, 90, 180}, fit k = n/c centers (blocked path, same
  sweeps), run `semantic_dedup` (GEMM assignment), record dedup wall,
  candidate pairs, dups found and absolute recall vs the same
  brute-force numpy truth as bench_warmfit_r12 — the evidence for the
  default c.

    python tools/bench_scaling_r13.py [K] [probe_dir]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate  # noqa: E402
from tools.bench_warmfit_r12 import dedup_quality, truth_dups  # noqa: E402


def _blocked_work_per_point(k: int, n_probe: int) -> float:
    """Expected scored centers per vector under the blocked probe:
    B block centers + n_probe blocks × (k/B) centers each (uniform
    block sizes — the optimistic bound; the probe's measured walls
    carry the real skew)."""
    B = int(np.ceil(np.sqrt(n_probe * k)))
    return B + min(n_probe, B) * (k / B)


def _assign_wall(df, fn, *args, **kw) -> float:
    t0 = time.time()
    fn(df, *args, **kw).localCheckpoint(eager=True).count()
    return round(time.time() - t0, 2)


def _candidate_pairs(assigned) -> int:
    from pyspark.sql import functions as F

    sizes = assigned.groupBy("centroid_id").count().collect()
    return int(sum(r["count"] * (r["count"] - 1) // 2 for r in sizes))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probe_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="r13probe_")
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
        semantic_dedup,
        semdedup_k,
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark(
        "r13probe",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/r13probewh",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, SF_DIR, probe_dir, k)
    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embK = spark.read.parquet(f"{probe_dir}/embeddings.parquet")
    # 50x: replicated straight from base (replicating the replica
    # would collide ids: both layers offset by the same SHIFT)
    big_dir = os.path.join(probe_dir, "x50")
    replicate(spark, SF_DIR, big_dir, 5 * k)
    emb50 = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    e1, eK, e50 = emb1.count(), embK.count(), emb50.count()
    dim = len(emb1.select("embedding").first()["embedding"])
    res: dict = {"k": k, "vectors": {"base": e1, "x10": eK, "x50": e50}}

    # ---- section 1: assignment stage isolated --------------------
    n_probe = 8
    assign = {}
    for tag, emb, n in (("x10", embK, eK), ("x50", emb50, e50)):
        kk = semdedup_k(n)
        cents = fit_centroids_blocked(
            emb, kk, n_iters=1, n_probe=n_probe
        ).localCheckpoint(eager=True)
        cents.count()
        flat_sec = _assign_wall(emb, gemm_assign, cents)
        blk_sec = _assign_wall(
            emb, blocked_assign, cents, n_probe
        )
        flat_ids = gemm_assign(emb, cents).withColumnRenamed(
            "centroid_id", "flat_cid"
        )
        agree = (
            blocked_assign(emb, cents, n_probe)
            .join(flat_ids, "vec_id")
            .filter(F.col("centroid_id") == F.col("flat_cid"))
            .count()
        )
        assign[tag] = {
            "n": n,
            "k": kk,
            "gemm_assign_sec": flat_sec,
            "blocked_assign_sec": blk_sec,
            "flat_scored_centers_per_vec": kk,
            "blocked_scored_centers_per_vec": round(
                _blocked_work_per_point(kk, n_probe), 1
            ),
            "assignment_agreement": round(agree / n, 4),
        }
    res["assign_scaling"] = assign

    # ---- section 2: cold fit wall + dedup quality ----------------
    fit = {}
    truthK = truth_dups(embK)
    for tag, emb, n in (("base", emb1, e1), ("x10", embK, eK)):
        kk = semdedup_k(n)
        row = {"n": n, "k": kk}
        for mode, probe in (("flat", None), ("blocked", n_probe)):
            t0 = time.time()
            cents = fit_centroids_blocked(
                emb, kk, n_iters=2, n_probe=probe
            )
            cents.localCheckpoint(eager=True).count()
            row[f"fit_{mode}_sec"] = round(time.time() - t0, 2)
            if tag == "x10":
                row[f"quality_{mode}"] = dedup_quality(
                    emb, cents, truthK
                )
        fit[tag] = row
    fit["truth_dups_x10"] = len(truthK)
    res["fit_scaling"] = fit

    # ---- section 3: recall vs cluster size c at 10x --------------
    sweep = {}
    for c in (25, 45, 90, 180):
        kk = max(2, eK // c)
        t0 = time.time()
        cents = fit_centroids_blocked(
            embK, kk, n_iters=2, n_probe=n_probe
        ).localCheckpoint(eager=True)
        cents.count()
        fit_sec = round(time.time() - t0, 2)
        t0 = time.time()
        out = semantic_dedup(
            embK, cents, threshold=0.35, gemm_assignment=True
        ).localCheckpoint(eager=True)
        dedup_sec = round(time.time() - t0, 2)
        found = {
            int(r["vec_id"])
            for r in out.filter(~F.col("kept")).select("vec_id").collect()
        }
        pairs = _candidate_pairs(
            out.select("vec_id", "centroid_id")
        )
        sweep[f"c{c}"] = {
            "k": kk,
            "fit_sec": fit_sec,
            "dedup_sec": dedup_sec,
            "candidate_pairs": pairs,
            "n_dups": len(found),
            "recall": round(len(found & truthK) / len(truthK), 4)
            if truthK
            else None,
        }
    res["c_sweep"] = sweep

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    merged = json.load(open(out_path))
    # merge, never replace: other round-13 probes (warmfit_blocked,
    # the incremental_cc re-run) write sibling keys
    merged.setdefault("round13", {}).update(res)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))
    if own_tmp:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
