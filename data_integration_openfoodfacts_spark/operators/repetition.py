"""Word-level repetition signals — the Gopher rule family the static
battery (`quality_rules.py`) doesn't cover: documents that loop, spin,
or boilerplate themselves to length. Signals per document (all exact
BIGINT counts; fractions are expressed as cross-multiplied integer
comparisons, never IEEE division — the engine's determinism rule):

- ``dup_words``   — word occurrences beyond each word's first
  (``n_words - distinct words``): crude but catches degenerate
  keyword-stuffing.
- ``top2_count``  — occurrences of the MOST frequent word 2-gram
  (Gopher's "top n-gram fraction" family, count-based).
- ``dup5_count``  — 5-gram occurrences beyond each distinct 5-gram's
  first (Gopher's "duplicate n-gram" family, count-based).

Deliberate divergence from Gopher as published: Gopher's fractions
count CHARACTERS COVERED by the offending n-grams (overlapping
occurrences unioned per document — an interval-union per doc); the
count-based form ranks documents the same way on everything but
pathological length-skewed grams, is a pure two-aggregate plan, and
replays exactly in any engine. Documented, not hidden.

Plan shape: the unigram signal is a narrow array expression riding the
scan (zero shuffle); the gram signals are ONE explode tagged by gram
size k ∈ {2,5} -> groupBy(doc, k, gram) with map-side combine ->
groupBy(doc) conditional agg — two shuffles keyed by the document,
nothing quadratic, output one row per document regardless of text
size. Tokenization is single-space split, the corpus shingle
convention (`similarity_dedup.word_shingles` / DuckDB
``string_split(text, ' ')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_repetition_signals", "repetition_flags"]

#: integer-exact thresholds (numerator multiplier, denominator
#: multiplier): flag passes iff count * num <= bound * den
TOP2_MAX = (5, 1)     # top 2-gram <= 1/5 of 2-gram occurrences
DUP5_MAX = (20, 3)    # duplicate 5-grams <= 3/20 (0.15)
DUPW_MAX = (2, 1)     # duplicate words <= 1/2


def word_repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_words, dup_words, top2_count, dup5_count) per document.
    Missing/short texts produce zero counts, never missing rows."""
    base = docs.select(
        F.col(id_col),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("t"),
    ).select(
        id_col,
        F.size("t").cast("long").alias("n_words"),
        (F.size("t") - F.size(F.array_distinct("t")))
        .cast("long")
        .alias("dup_words"),
        "t",
    )

    def grams(k: int):
        return base.select(
            id_col,
            F.lit(k).alias("k"),
            F.explode(
                F.when(
                    F.col("n_words") >= k,
                    F.transform(
                        F.sequence(
                            F.lit(1), F.col("n_words") - F.lit(k - 1)
                        ),
                        lambda i: F.concat_ws(
                            " ", F.slice("t", i, F.lit(k))
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )

    counts = (
        grams(2)
        .unionByName(grams(5))
        .groupBy(id_col, "k", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.coalesce(
            F.max(F.when(F.col("k") == 2, F.col("c"))), F.lit(0)
        ).cast("long").alias("top2_count"),
        F.coalesce(
            F.sum(F.when(F.col("k") == 5, F.col("c") - 1)), F.lit(0)
        ).cast("long").alias("dup5_count"),
    )
    return (
        base.select(id_col, "n_words", "dup_words")
        .join(per_doc, id_col, "left")
        .fillna(0, subset=["top2_count", "dup5_count"])
    )


def repetition_flags(signals: DataFrame) -> DataFrame:
    """Append the three pass flags (cross-multiplied integer
    thresholds; gram denominators are the occurrence counts
    ``n_words - k + 1``, floored at 0 for short docs — a doc too short
    to have grams trivially passes the gram rules)."""
    g2 = F.greatest(F.col("n_words") - 1, F.lit(0))
    g5 = F.greatest(F.col("n_words") - 4, F.lit(0))
    return signals.select(
        "*",
        (F.col("top2_count") * TOP2_MAX[0] <= g2 * TOP2_MAX[1]).alias(
            "r_top_2gram"
        ),
        (F.col("dup5_count") * DUP5_MAX[0] <= g5 * DUP5_MAX[1]).alias(
            "r_dup_5gram"
        ),
        (
            F.col("dup_words") * DUPW_MAX[0]
            <= F.col("n_words") * DUPW_MAX[1]
        ).alias("r_dup_words"),
    )
