"""Scaling probes for the round-11 families: the IVF nprobe retrieval
path behind q193's operating-point curve, and the persistent counting
screen driven by Structured Streaming (q192).

    python tools/bench_scaling_r11.py [k] [scratch_dir]

Claims probed (SCALING_LLM.json's committed-number discipline):

- ``q193_ivf_nprobe_fixed_queries``: a FIXED 1x query workload against
  a kx corpus at nprobe=2 — the assignment pass is linear in corpus
  (broadcast centroids, no shuffle of the big side), candidate volume
  grows ~kx (each probed list is kx deeper), and wall should track
  candidates, not corpus^2. The knob's cost model (candidates ~
  corpus_fraction * nprobe/nlists) is exactly what the q193 curve lets
  a user budget with; this probe pins that it holds at 10x.
- ``q192_counting_stream_fixed_triggers``: the availableNow drain with
  a FIXED trigger count (3 files) over kx rows per file — per-trigger
  cost is the batch's k-position hashing (linear, map-side combined)
  plus the O(m)-bounded store table, so the drain wall must grow FAR
  below kx while occurrences grow exactly kx (trigger overhead
  amortizes; the store table is capped by m regardless of corpus).

Merges results into SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROBE = 2
K_TOP = 10


def probe_ivf(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.functions.vectors import (
        cosine_similarity_expr,
    )
    from data_integration_openfoodfacts_spark.operators.similarity import (
        assign_to_centroids,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base_emb = load_table(spark, SF_DIR, "embeddings")
    # fixed centroids (ids 0..7 exist at every scale) and a fixed 1x
    # query workload, exactly q193's IVF setting
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    q2 = base_emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("__qv")
    ).localCheckpoint(eager=True)
    assigned = assign_to_centroids(emb, cents)
    qrank = (
        q2.crossJoin(F.broadcast(cents))
        .select(
            "q_id", "centroid_id",
            F.coalesce(
                cosine_similarity_expr("__qv", "centroid_vec"),
                F.lit(-2.0),
            ).alias("cs"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cs"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("r") <= NPROBE)
        .select("q_id", "centroid_id")
    )

    def topk():
        cand = (
            emb.select(F.col("vec_id").alias("c_id"), "embedding")
            .join(assigned.withColumnRenamed("vec_id", "c_id"), "c_id")
            .join(F.broadcast(qrank), "centroid_id")
            .filter(F.col("c_id") != F.col("q_id"))
            .join(F.broadcast(q2), "q_id")
            .select(
                "q_id", "c_id",
                F.coalesce(
                    cosine_similarity_expr("embedding", "__qv"),
                    F.lit(-2.0),
                ).alias("cosine"),
            )
        )
        return cand.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.desc("cosine"), F.asc("c_id")
                )
            ),
        ).filter(F.col("rk") <= K_TOP)

    sec = time_df(topk)
    n_cand = (
        emb.select(F.col("vec_id").alias("c_id"))
        .join(assigned.withColumnRenamed("vec_id", "c_id"), "c_id")
        .join(F.broadcast(qrank), "centroid_id")
        .filter(F.col("c_id") != F.col("q_id"))
        .count()
    )
    return {"sec": sec, "candidates": n_cand}


def probe_stream(spark, sf_dir: str, scratch: str) -> dict:
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )
    from data_integration_openfoodfacts_spark.streaming.counting_store import (
        run_counting_screen_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tmp = tempfile.mkdtemp(prefix="r11stream_", dir=scratch)
    src = f"{tmp}/src"
    docs.repartition(3).write.parquet(src)
    t0 = time.time()
    run_counting_screen_stream(
        spark, src, f"{tmp}/store", f"{tmp}/res", f"{tmp}/ckpt",
        max_files_per_trigger=1, n_words=8192, k=5, compact_every=2,
    )
    sec = round(time.time() - t0, 2)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"sec": sec, "occurrences": n_docs}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="r11_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, big_dir, k)
    base_ivf = probe_ivf(spark, SF_DIR)
    big_ivf = probe_ivf(spark, big_dir)
    base_st = probe_stream(spark, SF_DIR, scratch)
    big_st = probe_stream(spark, big_dir, scratch)
    # k-suffixed keys for non-default scales so a 30x run extends the
    # committed evidence instead of overwriting the 10x entries (the
    # r10_k30 convention)
    sfx = "" if k == 10 else f"_k{k}"
    out = {
        f"q193_ivf_nprobe_fixed_queries{sfx}": {
            "nprobe": NPROBE,
            "base_sec": base_ivf["sec"],
            f"x{k}_sec": big_ivf["sec"],
            "growth": round(
                big_ivf["sec"] / max(base_ivf["sec"], 1e-9), 2
            ),
            "base_candidates": base_ivf["candidates"],
            f"x{k}_candidates": big_ivf["candidates"],
            "cand_growth": round(
                big_ivf["candidates"]
                / max(base_ivf["candidates"], 1), 2
            ),
        },
        f"q192_counting_stream_fixed_triggers{sfx}": {
            "triggers": 3,
            "base_sec": base_st["sec"],
            f"x{k}_sec": big_st["sec"],
            "growth": round(
                big_st["sec"] / max(base_st["sec"], 1e-9), 2
            ),
            "base_occurrences": base_st["occurrences"],
            f"x{k}_occurrences": big_st["occurrences"],
        },
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
