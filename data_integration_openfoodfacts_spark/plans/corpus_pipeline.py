"""End-to-end pretraining-corpus curation pipeline: the round-trip
story that composes the engine's LLM-data operators into one auditable
pass — language filter -> rule-based quality battery (Gopher/C4) ->
model-based quality filter -> exact dedup -> benchmark decontamination
-> domain cap + mixture — with a per-stage row-accounting ledger as
the output (the dataset-card numbers every pipeline publishes: how
many documents each stage removed).

This is deliberately a COMPOSITION module: every stage delegates to
its dedicated operator (`quality_rules`, `quality_classifier`,
`similarity_dedup`, `mixture`), so the pipeline inherits each
operator's tested scale shape — narrow rule expressions, broadcast
weight/benchmark/rate tables, map-side-combined aggs, one rank window
— and adds nothing but joins on the document id. Near-dup (MinHash
q19/q42) and substring (q139/q140) stages slot in the same way; the
ledger uses exact-hash dedup so the DuckDB twin stays one WITH-chain.

Ledger cost (round-6 VERDICT #2): the stage counts ride the final
selection's OWN execution via ``observe`` + ``Observation`` — ONE
action total (a noop-format write that materializes the chain), zero
per-stage re-executions. The previous design unioned six count
aggregates, each re-running its chain prefix (~6 corpus scans per
dataset card at 100 TB); the streaming twin
(streaming/corpus_ingest.py) already counted this way, and the batch
path now matches it. Side inputs derived FROM a stage (the classifier
keep-set, the dedup keep-set, the contamination set, the rate table)
are built from un-observed twins of the stage frames so each
CollectMetrics node appears exactly once in the executed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.mixture import domain_cap_and_mix
from ..operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from ..operators.quality_rules import rule_pass_filter
from ..operators.similarity_dedup import benchmark_contamination, md5_long
from ..sources.parquet_source import load_table

STAGES = (
    "loaded",
    "lang_en",
    "rule_quality",
    "quality_keep",
    "exact_dedup",
    "decontaminated",
    "domain_mixture",
)


def run_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the curation ledger: (stage_no, stage, n_docs), one row
    per pipeline stage, ordered by stage_no — collected from a SINGLE
    execution of the final selection with per-stage ``observe``
    counters."""
    docs = load_table(spark, sf_dir, "documents")
    obs = {name: Observation() for name in STAGES}

    def counted(df: DataFrame, stage: str) -> DataFrame:
        return df.observe(obs[stage], F.count(F.lit(1)).alias("n"))

    # `chain` is the observed main flow; the s* frames are un-observed
    # twins used ONLY to derive side inputs (each Observation may
    # appear once in the executed plan).
    chain = counted(docs, "loaded")

    # 1. language filter (metadata column; functions/text_analysis.py's
    # n-gram lang-id is the no-metadata path, oracle-gated as q22)
    lang_en = F.col("lang") == "en"
    s1 = docs.filter(lang_en)
    chain = counted(chain.filter(lang_en), "lang_en")

    # 2. rule-based quality battery (Gopher/C4 heuristics,
    # operators/quality_rules.py, oracle-gated as q158) — the cheap
    # narrow filter that fronts the learned classifier
    rules_ok = rule_pass_filter("text")
    s2 = s1.filter(rules_ok)
    chain = counted(chain.filter(rules_ok), "rule_quality")

    # 3. model-based quality filter (q134's classifier, keep >= 0.5)
    keep_q = (
        hashed_linear_score(
            s2, synthetic_weights(spark, 4096), num_buckets=4096,
            threshold=0.5,
        )
        .filter(F.col("keep"))
        .select("doc_id")
    )
    s3 = s2.join(keep_q, "doc_id")
    chain = counted(chain.join(keep_q, "doc_id"), "quality_keep")

    # 4. exact dedup: keep the lowest doc_id per exact text
    keep_d = (
        s3.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s4 = s3.join(keep_d, "doc_id")
    chain = counted(chain.join(keep_d, "doc_id"), "exact_dedup")

    # 5. benchmark decontamination (q46's operator): the held-out
    # benchmark slice leaves the corpus entirely, and any training doc
    # sharing >= 5 distinct 3-gram shingles with it is cut
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    not_bench = F.col("doc_id") % 50 != 0
    s4b = s4.filter(not_bench)
    contaminated = benchmark_contamination(
        s4b, benchmark, "doc_id", "text", n=3, min_shared=5
    ).select("doc_id")
    s5 = s4b.join(contaminated, "doc_id", "left_anti")
    chain = counted(
        chain.filter(not_bench).join(contaminated, "doc_id", "left_anti"),
        "decontaminated",
    )

    # 6. domain cap + mixture (q145's operator, rates from md5(source))
    rates = (
        s5.select("source")
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
    chain = counted(
        domain_cap_and_mix(chain, rates, cap=15).filter(F.col("selected")),
        "domain_mixture",
    )

    # ONE action fills every Observation: a noop-format write executes
    # the full plan without collecting anything to the driver.
    chain.write.format("noop").mode("overwrite").save()

    rows = [
        (no, name, int(obs[name].get["n"]))
        for no, name in enumerate(STAGES)
    ]
    return spark.createDataFrame(
        rows, "stage_no int, stage string, n_docs long"
    ).orderBy("stage_no")
