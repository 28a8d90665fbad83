"""Ledger-growth probe for the incremental shingle-novelty path
(round-7; the q128-style "O(batch) against a grown index" measurement
applied to operators/novelty.py): score the SAME fixed tranche against
a 1x and a Kx shingle ledger and log wall time + ledger row counts.

Decorrelation (the bench_scaling_llm rule): replicas suffix every
token ``w -> w_r{i}``, so replica shingles share nothing with the base
corpus or each other — the Kx ledger is K-times the DISTINCT shingles,
not K copies of the same keys. The probe tranche uses suffix ``_probe``
(absent from every ledger), so its novelty work is identical in both
runs; only the anti-join's ledger side grows.

What "flat" means here: the tranche's shingle/agg work is O(tranche)
by construction; the anti-join streams the ledger's 32-byte key column
once per batch (broadcast of the small tranche side — no ledger
shuffle). At probe scale that column scan is noise; at true 100 TB
ledger scale the scan is bounded by ledger-key bytes/trigger and the
documented next step is key-range partitioning of the ledger parquet
so the anti-join prunes to the tranche's key buckets.

    python tools/bench_scaling_novelty.py [K] [probe_dir]

Appends its results under SCALING_LLM.json "queries" as
"q159_novelty_ledger_fixed_tranche".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10**9


def decorrelated_docs(spark, src: str, k: int):
    """K decorrelated replicas of the documents table (token-suffixed;
    replica 0 is the original) — the bench_scaling_llm recipe, docs
    only."""
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "text"
    )
    rep = docs.withColumn(
        "__rep", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_r"), F.col("__rep").cast("string")),
        ),
        " ",
    )
    return (
        rep.withColumn(
            "doc_id", F.col("doc_id") + F.col("__rep").cast("long") * SHIFT
        )
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(suffixed),
        )
        .drop("__rep")
    )


def probe_tranche(spark, src: str):
    docs = spark.read.parquet(f"{src}/documents.parquet").select(
        "doc_id", "text"
    )
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_probe")),
        ),
        " ",
    )
    return docs.withColumn("doc_id", F.col("doc_id") + 20 * SHIFT).withColumn(
        "text", suffixed
    )


def ledger_of(spark, docs):
    from data_integration_openfoodfacts_spark.operators.novelty import (
        doc_shingle_keys,
    )

    return (
        doc_shingle_keys(docs, "doc_id", "text", n=8)
        .groupBy("shingle_md5")
        .agg(F.min("doc_id").alias("first_doc"))
        .localCheckpoint(eager=True)
    )


def score_time(spark, tranche, ledger) -> tuple[float, int, int]:
    from data_integration_openfoodfacts_spark.operators.novelty import (
        tranche_novelty_update,
    )

    t0 = time.time()
    per_doc, new_firsts = tranche_novelty_update(
        tranche, ledger, "doc_id", "text", n=8, checkpoint_shingles=True
    )
    n_new = new_firsts.count()
    n_docs = per_doc.count()
    return time.time() - t0, n_docs, n_new


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("bench-scaling-novelty")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = decorrelated_docs(spark, SF_DIR, 1).localCheckpoint(True)
    big_docs = decorrelated_docs(spark, SF_DIR, k).localCheckpoint(True)
    tranche = probe_tranche(spark, SF_DIR).localCheckpoint(True)

    led_base = ledger_of(spark, base_docs)
    led_big = ledger_of(spark, big_docs)
    rows_base, rows_big = led_base.count(), led_big.count()

    # warm both paths once, then min-of-2 timed runs
    score_time(spark, tranche, led_base)
    base_sec = min(score_time(spark, tranche, led_base)[0] for _ in range(2))
    score_time(spark, tranche, led_big)
    big_sec, n_docs, n_new = None, None, None
    best = None
    for _ in range(2):
        s, n_docs, n_new = score_time(spark, tranche, led_big)
        best = s if best is None else min(best, s)
    big_sec = best

    entry = {
        "base_sec": round(base_sec, 2),
        "x10_sec": round(big_sec, 2),
        "growth": round(big_sec / base_sec, 2),
        "ledger_rows_base": rows_base,
        "ledger_rows_big": rows_big,
        "tranche_docs": n_docs,
        "tranche_new_firsts": n_new,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    key = "q159_novelty_ledger_fixed_tranche" + (
        "" if k == 10 else f"_k{k}"
    )
    rep = json.load(open(path))
    rep["queries"][key] = entry
    json.dump(rep, open(path, "w"), indent=1)
    print(json.dumps({key: entry}))


if __name__ == "__main__":
    main()
