"""Round-12 scale probes (VERDICT r11 #3 and #5).

1. **Log-scaled MinHash banding**: the fixed (num_hashes=8,
   band_size=2) layout's candidates grew 12x at 10x docs
   (SCALING_LLM.json: q19 wall 5.09x) because random-pair band
   collisions scale with n² at constant per-band collision
   probability. `logscaled_minhash_layout` grows rows-per-band with
   log10(corpus growth) — each extra row multiplies a random pair's
   band-collision probability by its (low) shingle-overlap rate — and
   re-sizes the band count to keep analytic recall at the design
   threshold. Probe: candidates + wall at 1x and 10x for both
   layouts, with RECALL pinned against the exact prefix-filtered
   Jaccard pairs (recall-1.0 SSJoin truth) at the design threshold.

2. **SemDeDup k∝n**: q75's documented k ~ sqrt(n) policy bounds total
   pairs at n^1.5 — 3.61x wall at 10x. The fixed-CLUSTER-SIZE policy
   (k = n / target_cluster_size) keeps expected within-cluster pairs
   ~n * (c-1)/2 — linear. Probe both policies at 1x and 10x through
   `fit_centroids_lloyd` + `semantic_dedup`: assignment-derived
   candidate-pair counts, dedup wall, and the duplicate sets'
   agreement (the k∝n run must not lose dup coverage vs sqrt-k).
   Caveat measured honestly: with k∝n the Lloyd FIT's per-iteration
   assignment cost is n*k ~ n²/c — the fit is reported separately
   because production k∝n SemDeDup amortizes fitting (minibatch /
   hierarchical); the DEDUP stage is what must stay ~linear.

Replication reuses bench_scaling_llm's decorrelation (replica-suffixed
tokens / dimension-rotated embeddings: K-times more data, not K exact
copies). Results merge into SCALING_LLM.json under round-12 keys.

    python tools/bench_scaling_r12.py [K] [probe_dir]
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

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate  # noqa: E402


def wall(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def minhash_probe(spark, docs, layout_name, num_hashes, band_size, truth):
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (  # noqa: E501
        minhash_lsh_pairs,
    )

    def run():
        return (
            minhash_lsh_pairs(
                docs, "doc_id", "text", n=3,
                num_hashes=num_hashes, band_size=band_size,
            )
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )

    pairs, sec = wall(run)
    n_cand = pairs.count()
    n_truth = truth.count()
    hit = pairs.join(truth, ["id_a", "id_b"], "left_semi").count()
    recall = round(hit / n_truth, 4) if n_truth else None
    return {
        "layout": layout_name,
        "num_hashes": num_hashes,
        "band_size": band_size,
        "sec": sec,
        "candidates": n_cand,
        "truth_pairs": n_truth,
        "recall_at_threshold": recall,
    }


def semdedup_probe(spark, emb, k, threshold=0.35, gemm=False):
    from data_integration_openfoodfacts_spark.operators.clustering import (
        fit_centroids_lloyd,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        semantic_dedup,
    )

    cents, fit_sec = wall(
        lambda: fit_centroids_lloyd(emb, k=k).localCheckpoint(eager=True)
    )

    def run():
        return semantic_dedup(
            emb, cents, threshold=threshold, gemm_assignment=gemm
        )

    out, dedup_sec = wall(lambda: run().localCheckpoint(eager=True))
    dups = out.filter(~F.col("kept")).select("vec_id")
    n_dups = dups.count()
    # candidate pairs = sum over clusters of m*(m-1)/2
    pair_count = (
        out.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("m"))
        .select(F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    )
    return {
        "k": k,
        "fit_sec": fit_sec,
        "dedup_sec": dedup_sec,
        "candidate_pairs": int(pair_count or 0),
        "n_dups": n_dups,
    }, dups


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    probe_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="scale12_")
    )
    own_tmp = len(sys.argv) <= 2

    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (  # noqa: E501
        logscaled_minhash_layout,
        prefix_filter_jaccard_pairs,
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark(
        "scale12",
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/scale12wh",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, SF_DIR, probe_dir, k)

    docs1 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docsK = spark.read.parquet(f"{probe_dir}/documents.parquet")
    n1, nK = docs1.count(), docsK.count()

    # truth at the DESIGN threshold, recall-1.0 by construction
    t_design = 0.5
    truth1 = (
        prefix_filter_jaccard_pairs(
            docs1, "doc_id", "text", n=3, threshold=t_design
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    truthK = (
        prefix_filter_jaccard_pairs(
            docsK, "doc_id", "text", n=3, threshold=t_design
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )

    results = {"k": k, "base_docs": n1, "big_docs": nK}
    results["minhash_fixed_base"] = minhash_probe(
        spark, docs1, "fixed", 8, 2, truth1
    )
    results["minhash_fixed_x10"] = minhash_probe(
        spark, docsK, "fixed", 8, 2, truthK
    )
    nh1, bs1 = logscaled_minhash_layout(n1)
    nhK, bsK = logscaled_minhash_layout(nK)
    results["minhash_logscaled_base"] = minhash_probe(
        spark, docs1, "logscaled", nh1, bs1, truth1
    )
    results["minhash_logscaled_x10"] = minhash_probe(
        spark, docsK, "logscaled", nhK, bsK, truthK
    )

    emb1 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embK = spark.read.parquet(f"{probe_dir}/embeddings.parquet")
    e1, eK = emb1.count(), embK.count()
    target_c = 45  # k∝n: fixed expected cluster size
    sq1, sqK = round(math.sqrt(e1)), round(math.sqrt(eK))
    ln1, lnK = max(2, e1 // target_c), max(2, eK // target_c)
    sd = {}
    sd["sqrtk_base"], d_sq1 = semdedup_probe(spark, emb1, sq1)
    sd["sqrtk_x10"], d_sqK = semdedup_probe(spark, embK, sqK)
    sd["kpropn_base"], d_ln1 = semdedup_probe(spark, emb1, ln1)
    sd["kpropn_x10"], d_lnK = semdedup_probe(spark, embK, lnK)
    # the k∝n SCALE path: GEMM assignment (the fold crossJoin shuffles
    # n x k scored rows — the measured bottleneck once k grows with n)
    sd["kpropn_gemm_base"], d_g1 = semdedup_probe(
        spark, emb1, ln1, gemm=True
    )
    sd["kpropn_gemm_x10"], d_gK = semdedup_probe(
        spark, embK, lnK, gemm=True
    )
    # dup-coverage agreement: fraction of sqrt-k dups the k∝n run
    # also finds (smaller clusters can only LOSE cross-cluster pairs)
    for tag, a, b in [("base", d_sq1, d_ln1), ("x10", d_sqK, d_lnK)]:
        n_sq = a.count()
        both = a.join(b, "vec_id", "left_semi").count()
        sd[f"dup_agreement_{tag}"] = (
            round(both / n_sq, 4) if n_sq else None
        )
    # ABSOLUTE recall against brute-force truth (a doc is a true dup
    # iff some LOWER-id vector has cosine >= threshold): numpy GEMM
    # over the collected embedding matrix — probe-side only, the
    # operator never collects. Run per scale for every policy.
    import numpy as np

    def truth_dups(emb_df):
        rows = emb_df.select("vec_id", "embedding").collect()
        rows.sort(key=lambda r: r["vec_id"])
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        M = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
        )
        n = np.linalg.norm(M, axis=1)
        Mn = M / np.where(n == 0.0, 1.0, n)[:, None]
        dup = np.zeros(len(ids), dtype=bool)
        step = 2048
        for s in range(0, len(ids), step):
            S = Mn[s : s + step] @ Mn.T
            for i in range(S.shape[0]):
                gi = s + i
                if gi == 0:
                    continue
                if n[gi] == 0.0:
                    # zero-norm rows score -2.0 everywhere: never dups
                    continue
                row = S[i, :gi]
                mask = n[:gi] > 0.0
                if np.any(row[mask] >= 0.35):
                    dup[gi] = True
        return {int(v) for v in ids[dup]}

    t1, tK = truth_dups(emb1), truth_dups(embK)
    for tag, truth, pols in [
        ("base", t1, [("sqrtk", d_sq1), ("kpropn", d_ln1),
                      ("kpropn_gemm", d_g1)]),
        ("x10", tK, [("sqrtk", d_sqK), ("kpropn", d_lnK),
                     ("kpropn_gemm", d_gK)]),
    ]:
        sd[f"truth_dups_{tag}"] = len(truth)
        for pol, dvals in pols:
            found = {int(r["vec_id"]) for r in dvals.collect()}
            sd[f"recall_{pol}_{tag}"] = (
                round(len(found & truth) / len(truth), 4)
                if truth
                else None
            )
    results["semdedup"] = sd

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    try:
        merged = json.load(open(out_path))
    except Exception:  # noqa: BLE001
        merged = {}
    merged.setdefault("round12", {}).update(results)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(json.dumps(results, indent=1))
    if own_tmp:
        shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
