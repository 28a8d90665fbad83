"""Corpus-growth probe for the near-dup ingest TRIGGER (round 8):
ingest the SAME fixed batch into a 1x and a Kx corpus store + band
ledger and log the full trigger wall — the end-to-end measurement of
this round's layout work (md5-bucketed corpus, sb-bucketed band
ledger, broadcast-batch membership probes). The per-trigger cost a
100 TB crawl pipeline pays is exactly this wall; "O(batch) per
trigger" is the claim under test.

Decorrelation (the bench_scaling_llm rule): corpus replicas suffix
every token ``w -> w_r{i}`` so the Kx store holds K-times the DISTINCT
texts/signatures; the probe batch suffixes ``_probe`` (absent from
every store) so its own work is constant — only the membership scans'
store side grows. Stores are PRE-BUILT (untimed) and copied per timed
run so every ingest mutates a fresh copy.

    python tools/bench_scaling_ingest.py [K]

Appends results under SCALING_LLM.json "queries" as
"neardup_ingest_trigger".
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 10**9


def docs_with_meta(df):
    return df.select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("probe").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def decorrelated_docs(spark, src: str, k: int):
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


def build_store(spark, docs, corpus_path: str, bands_path: str) -> int:
    """Pre-build the corpus store + band ledger for ``docs`` (untimed
    setup, the bucketed layouts the ingest writes)."""
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (  # noqa: E501
        minhash_band_signatures,
    )
    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        append_bands,
        append_corpus,
    )

    rows = docs_with_meta(docs).withColumn("text_md5", F.md5("text"))
    append_corpus(rows, corpus_path)
    append_bands(
        minhash_band_signatures(rows, "doc_id", "text"), bands_path
    )
    return spark.read.parquet(corpus_path).count()


def probe_batch(spark, src: str, n_docs: int = 500):
    docs = (
        spark.read.parquet(f"{src}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_docs)
    )
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_probe")),
        ),
        " ",
    )
    return docs_with_meta(
        docs.withColumn("doc_id", F.col("doc_id") + 20 * SHIFT).withColumn(
            "text", suffixed
        )
    )


def trigger_time(spark, batch, corpus_src, bands_src, scratch) -> float:
    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        ingest_corpus_batch_neardup,
    )

    c = f"{scratch}/corpus"
    b = f"{scratch}/bands"
    shutil.copytree(corpus_src, c)
    shutil.copytree(bands_src, b)
    t0 = time.time()
    ingest_corpus_batch_neardup(batch, c, b)
    dt = time.time() - t0
    shutil.rmtree(scratch, ignore_errors=True)
    return dt


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("bench-scaling-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        base_docs = decorrelated_docs(spark, SF_DIR, 1).localCheckpoint(True)
        big_docs = decorrelated_docs(spark, SF_DIR, k).localCheckpoint(True)
        stores = {}
        for tag, docs in (("base", base_docs), (f"x{k}", big_docs)):
            c, b = f"{tmp}/{tag}_corpus", f"{tmp}/{tag}_bands"
            rows = build_store(spark, docs, c, b)
            stores[tag] = (c, b, rows)
        batch = probe_batch(spark, SF_DIR).localCheckpoint(True)

        walls = {}
        for tag, (c, b, _) in stores.items():
            # warm once, then min-of-2
            trigger_time(spark, batch, c, b, f"{tmp}/w_{tag}")
            walls[tag] = min(
                trigger_time(spark, batch, c, b, f"{tmp}/t_{tag}_{i}")
                for i in range(2)
            )
        entry = {
            "base_sec": round(walls["base"], 2),
            f"x{k}_sec": round(walls[f"x{k}"], 2),
            "growth": round(walls[f"x{k}"] / walls["base"], 2),
            "corpus_rows_base": stores["base"][2],
            "corpus_rows_big": stores[f"x{k}"][2],
            "batch_docs": batch.count(),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    key = "neardup_ingest_trigger" + ("" if k == 10 else f"_k{k}")
    rep = json.load(open(path))
    rep["queries"][key] = entry
    json.dump(rep, open(path, "w"), indent=1)
    print(json.dumps({key: entry}))


if __name__ == "__main__":
    raise SystemExit(main())
