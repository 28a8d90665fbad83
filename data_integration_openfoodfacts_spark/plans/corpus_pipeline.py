"""End-to-end pretraining-corpus curation pipeline: the round-trip
story that composes the engine's LLM-data operators into one auditable
pass — language filter -> model-based quality filter -> exact dedup ->
benchmark decontamination -> domain cap + mixture — with a per-stage
row-accounting ledger as the output (the dataset-card numbers every
pipeline publishes: how many documents each stage removed).

This is deliberately a COMPOSITION module: every stage delegates to
its dedicated operator (`quality_classifier`, `similarity_dedup`,
`mixture`), so the pipeline inherits each operator's tested scale
shape — broadcast weight/benchmark/rate tables, map-side-combined
aggs, one rank window — and adds nothing but joins on the document
id. Near-dup (MinHash q19/q42) and substring (q139/q140) stages slot
in the same way; the ledger uses exact-hash dedup so the DuckDB twin
stays one WITH-chain.

Scale note: the ledger computes six stage counts by unioning six
aggregates over a shared lineage. Spark recomputes the shared prefix
per branch (counts are cheap scans); a production run would persist
the final selection and emit counts as side metrics instead —
structure documented here, exercised by q148 at gate scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mixture import domain_cap_and_mix
from ..operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from ..operators.similarity_dedup import benchmark_contamination, md5_long
from ..sources.parquet_source import load_table


def run_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the curation ledger: (stage_no, stage, n_docs), one row
    per pipeline stage, ordered by stage_no."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. language filter (metadata column; functions/text_analysis.py's
    # n-gram lang-id is the no-metadata path, oracle-gated as q22)
    s1 = docs.filter(F.col("lang") == "en")

    # 2. model-based quality filter (q134's classifier, keep >= 0.5)
    keep_q = hashed_linear_score(
        s1, synthetic_weights(spark, 4096), num_buckets=4096, threshold=0.5
    ).filter(F.col("keep")).select("doc_id")
    s2 = s1.join(keep_q, "doc_id")

    # 3. exact dedup: keep the lowest doc_id per exact text
    keep_d = (
        s2.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s3 = s2.join(keep_d, "doc_id")

    # 4. benchmark decontamination (q46's operator): the held-out
    # benchmark slice leaves the corpus entirely, and any training doc
    # sharing >= 5 distinct 3-gram shingles with it is cut
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    s3b = s3.filter(F.col("doc_id") % 50 != 0)
    contaminated = benchmark_contamination(
        s3b, benchmark, "doc_id", "text", n=3, min_shared=5
    ).select("doc_id")
    s4 = s3b.join(contaminated, "doc_id", "left_anti")

    # 5. domain cap + mixture (q145's operator, rates from md5(source))
    rates = (
        s4.select("source")
        .distinct()
        .select(
            "source",
            (
                F.lit(100)
                + F.pmod(
                    md5_long(F.concat(F.lit("mix"), F.col("source"))),
                    F.lit(9),
                )
                * 100
            ).cast("long").alias("rate_permille"),
        )
    )
    s5 = domain_cap_and_mix(s4, rates, cap=15).filter(F.col("selected"))

    def ledger(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            "n_docs",
        )

    return (
        ledger(0, "loaded", docs)
        .unionAll(ledger(1, "lang_en", s1))
        .unionAll(ledger(2, "quality_keep", s2))
        .unionAll(ledger(3, "exact_dedup", s3))
        .unionAll(ledger(4, "decontaminated", s4))
        .unionAll(ledger(5, "domain_mixture", s5))
        .orderBy("stage_no")
    )
