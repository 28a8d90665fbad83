"""30x scale points for the round-9 operator families (round-10
VERDICT #5): classifier training (q164), span-exact substring removal
(q166) and incremental embedding ingest (q167) already have measured
10x probes in SCALING_LLM.json; this extends each with a 30x point —
the precedent is the novelty ledger's k30 entries (1.15x at 30x).

    python tools/bench_scaling_r10_k30.py [k] [scratch_dir]

Reuses bench_scaling_llm's replication (token-decorrelated doc
replicas, rotated embedding replicas) and timing (min of 2 noop-sink
runs) so the k30 numbers are directly comparable with the k10 ones.
Prints ONE JSON object with the three new entries and MERGES them into
SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, SHIFT, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_three(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.operators.embedding_ingest import (
        append_embedding_bands,
        embedding_band_signatures,
        incremental_embedding_dedup,
    )
    from data_integration_openfoodfacts_spark.operators.substring_dedup import (
        remove_duplicate_spans,
    )
    from data_integration_openfoodfacts_spark.operators.training import (
        doc_bucket_features,
        train_hashed_logistic,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    res = {}

    labeled = docs.select(
        "doc_id", "text", (F.col("lang") == "en").cast("long").alias("y")
    )
    res["q164_training_linear"] = {
        "sec": time_df(
            lambda: train_hashed_logistic(labeled, num_buckets=64, n_iters=3)
        ),
        "candidates": doc_bucket_features(labeled, 64).count(),
    }

    res["q166_span_removal_linear"] = {
        "sec": time_df(lambda: remove_duplicate_spans(docs, window=8)),
        "candidates": int(
            remove_duplicate_spans(docs, window=8)
            .agg(F.sum("n_tokens").alias("s"))
            .first()["s"]
        ),
    }

    # fixed batch from the BASE dir, id-shifted out of every ledger's
    # id space — the crawl claim: ingest wall is O(batch), ~flat while
    # the ledger behind it grows 30x.
    fixed_batch = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") % 3 == 0)
        .select((F.col("vec_id") + 50 * SHIFT).alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    eb_tmp = tempfile.mkdtemp(prefix="q167_probe30_")
    eb_path = f"{eb_tmp}/bands"
    append_embedding_bands(
        embedding_band_signatures(emb, 64, rows_per_band=16, num_bands=8),
        eb_path,
    )

    def run_q167():
        survivors, _ = incremental_embedding_dedup(
            fixed_batch, eb_path, 64,
            rows_per_band=16, num_bands=8, append=False,
        )
        return survivors.select("vec_id")

    res["q167_embedding_ingest_fixed_batch"] = {
        "sec": time_df(run_q167),
        "candidates": spark.read.parquet(eb_path).count(),
    }
    shutil.rmtree(eb_tmp, ignore_errors=True)

    # q170 Bloom screen: a FIXED batch (the base dir's doc_id % 3 == 0
    # text keys) probed against a word table seeded from THIS scale's
    # corpus keys — the whole-point claim: the table is O(m) bits no
    # matter how many keys went in, so probe wall stays flat while
    # "candidates" (inserted corpus keys) grows with the corpus.
    from data_integration_openfoodfacts_spark.operators.bloom import (
        bloom_probe_keys,
    )
    from data_integration_openfoodfacts_spark.streaming.bloom_ingest import (
        DEFAULT_K,
        DEFAULT_WORDS,
        seed_bloom,
    )

    corpus_keys = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.md5("text").alias("kk")
    )
    fixed_keys = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 3 == 0)
        .select(F.md5("text").alias("kk"))
        .localCheckpoint(eager=True)
    )
    bl_tmp = tempfile.mkdtemp(prefix="q170_probe_")
    bl_path = f"{bl_tmp}/bloom"
    seed_bloom(corpus_keys, "kk", bl_path, DEFAULT_WORDS, DEFAULT_K)
    table = spark.read.parquet(bl_path).localCheckpoint(eager=True)
    res["q170_bloom_screen_fixed_batch"] = {
        "sec": time_df(
            lambda: bloom_probe_keys(
                fixed_keys, "kk", table, DEFAULT_WORDS, DEFAULT_K
            )
        ),
        "candidates": corpus_keys.distinct().count(),
    }
    shutil.rmtree(bl_tmp, ignore_errors=True)
    return res


def main() -> None:
    from data_integration_openfoodfacts_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark("bench-scaling-r10-k30")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="scaleprobe_k30_")
    )
    print(f"replicating docs/embeddings {k}x -> {scratch}", file=sys.stderr)
    replicate(spark, SF_DIR, scratch, k)
    base = probe_three(spark, SF_DIR)
    big = probe_three(spark, scratch)
    new_entries = {}
    for name in base:
        b, g = base[name], big[name]
        new_entries[f"{name}_k{k}"] = {
            "base_sec": b["sec"],
            f"x{k}_sec": g["sec"],
            "growth": round(g["sec"] / b["sec"], 2) if b["sec"] else None,
            "base_candidates": b["candidates"],
            f"x{k}_candidates": g["candidates"],
            "cand_growth": round(g["candidates"] / b["candidates"], 2)
            if b["candidates"]
            else None,
        }
        print(f"{name}_k{k}: {json.dumps(new_entries[f'{name}_k{k}'])}",
              file=sys.stderr)
    record = os.path.join(REPO, "SCALING_LLM.json")
    with open(record) as f:
        full = json.load(f)
    full["queries"].update(new_entries)
    with open(record, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps({"k": k, "queries": new_entries}))
    if scratch.startswith(tempfile.gettempdir()):
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
