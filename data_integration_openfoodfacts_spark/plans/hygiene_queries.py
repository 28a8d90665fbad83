"""Corpus-hygiene queries (round 7): the cheap rule-based quality
battery and the incremental shingle-novelty ledger — the two
front-of-pipeline operators a production curation stack runs on every
new crawl tranche before any model or heavy dedup cost.

New module on purpose (CLAUDE.md): queries fingerprint by their
implementing module's import closure, so landing round-7 queries here
— instead of growing plans/llm_queries.py or curation_queries.py —
re-verifies only these entries per edit.

Reference-parity note: the reference (Sevlac/data-integration-
openfoodfacts) has no text-quality or novelty machinery — these extend
the engine along the LLM-training-data axis the build brief calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality_rules import (
    rule_flags_sql,
    rule_quality_signals,
    rule_signals_sql,
)
from ..sources.parquet_source import load_table


def q158_rule_quality_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document Gopher/C4 rule battery
    (`operators/quality_rules.py`): word-count bounds, mean-word-length
    bounds, symbol/bullet/ellipsis ratios, alphabetic-word ratio, and
    stopword presence — every signal a narrow whole-stage-codegen
    expression riding the scan (zero shuffles; `.explain` shows one
    Project over the parquet scan). Emits the eight BIGINT signals,
    the seven boolean flags, and the combined ``pass_rules`` so the
    oracle value-checks the arithmetic, not just the verdict."""
    docs = load_table(spark, sf_dir, "documents")
    return rule_quality_signals(docs.select("doc_id", "text")).drop("text")


def _q158_oracle() -> str:
    sig = rule_signals_sql("text")
    flags = rule_flags_sql()
    sig_cols = ",\n         ".join(
        f"{expr} AS {name}" for name, expr in sig.items()
    )
    flag_cols = ",\n       ".join(
        f"{expr} AS {name}" for name, expr in flags.items()
    )
    pass_expr = " AND ".join(flags.values())
    return f"""
WITH sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM documents
)
SELECT doc_id,
       n_words, sum_word_len, n_alpha_words, n_symbols, n_lines,
       n_bullet_lines, n_ellipsis_lines, n_stopwords,
       {flag_cols},
       ({pass_expr}) AS pass_rules
FROM sig
"""


Q158_ORACLE = _q158_oracle()


HYGIENE_QUERIES = {
    "q158_rule_quality_battery": q158_rule_quality_battery,
}

HYGIENE_ORACLES = {
    "q158_rule_quality_battery": Q158_ORACLE,
}
