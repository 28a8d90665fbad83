"""Text analysis for training-data pipelines: token stats, quality
scoring, heuristic language ID, rolling-hash fingerprints.

All pure Column expressions (whole-stage codegen, no Python boundary) —
these run at full scan speed over 100 TB of documents. The BPE-ish
tokenizer is a regex approximation (letter runs / digit runs /
single punctuation), good enough for length accounting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

# Stopword sample used for quality ratios (tiny on purpose — a real
# deployment swaps in a language-keyed broadcast list).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(F.split(F.trim(_c(col)), "\\s+")).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0)).cast(
        "long"
    )


def stopword_ratio(col: Column | str) -> Column:
    toks = F.split(F.trim(_c(col)), "\\s+")
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return F.try_divide(n_stop.cast("double"), F.size(toks))


def punct_ratio(col: Column | str) -> Column:
    # try_divide: empty text -> NULL ratio instead of an ANSI
    # DIVIDE_BY_ZERO that would abort the whole scan.
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))
    return F.try_divide(n_punct.cast("double"), F.length(c))


def quality_score(col: Column | str) -> Column:
    """Composite 0-3 quality score: long enough, low punctuation noise,
    not stopword-soup. Mirrors the length/punct/stopword heuristics used
    by LLM corpus filters (e.g. Gopher rules), kept integer-exact so
    engines agree."""
    c = _c(col)
    return (
        (F.length(c) >= 100).cast("long")
        + (punct_ratio(c) <= 0.1).cast("long")
        + (stopword_ratio(c) <= 0.5).cast("long")
    ).alias("quality_score")


def language_id(col: Column | str) -> Column:
    """Deterministic marker-token language heuristic. Real n-gram
    language ID plugs in the same shape: per-language token scores, then
    an argmax with a fixed tiebreak order."""
    toks = F.split(F.trim(_c(col)), "\\s+")
    def score(words: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))

    s_query = score(("query", "table", "scan", "join"))
    s_stream = score(("stream", "window", "batch", "watermark"))
    s_vector = score(("vector", "merge", "hash", "sort"))
    return (
        F.when((s_query >= s_stream) & (s_query >= s_vector), F.lit("querylang"))
        .when(s_stream >= s_vector, F.lit("streamlang"))
        .otherwise(F.lit("vectorlang"))
    )


def rolling_fingerprint(col: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters:
    ``acc = (acc*31 + ascii(ch)) % mod`` folded left-to-right — the
    classic Rabin-Karp document fingerprint. Sequential fold matches
    DuckDB ``list_reduce`` exactly."""
    chars = F.split(_c(col), "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % mod,
    )


def ws_tokens(col: Column | str) -> Column:
    """Whitespace token array (DuckDB twin: string_split_regex(trim(x),
    '\\s+')). Callers computing several repetition signals should
    project this ONCE and feed the attribute to the helpers below —
    higher-order functions re-evaluate captured expression trees per
    element, so an un-materialized split inside a lambda turns O(n^2)
    comparisons into O(n^3) regex work."""
    return F.split(F.trim(_c(col)), "\\s+")


def top_element_count(arr: Column) -> Column:
    """Occurrence count of the most frequent array element (NULL for an
    empty array) — the numerator of the Gopher-style "fraction of text
    in the top word / 2-gram" repetition signals. Per-row expression:
    O(distinct x n) comparisons against an attribute reference, zero
    shuffle — at 100 TB this rides the scan stage.

    DuckDB twin: list_max(list_transform(list_distinct(t),
    w -> len(list_filter(t, x -> x = w))))."""
    return F.array_max(
        F.transform(
            F.array_distinct(arr),
            lambda w: F.size(F.filter(arr, lambda x: x == w)),
        )
    ).cast("long")


def distinct_element_ratio(arr: Column) -> Column:
    """distinct elements / total elements — low values flag boilerplate
    and generated spam. Single IEEE division of two exact ints
    (hash-stable across engines)."""
    return F.size(F.array_distinct(arr)) / F.size(arr)


def bigram_array(toks: Column) -> Column:
    """Adjacent 2-grams of a token array (empty if < 2 tokens)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
