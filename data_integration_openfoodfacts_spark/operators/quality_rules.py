"""Rule-based document quality battery — the cheap Gopher/C4-style
heuristic filters every production curation stack runs BEFORE the
learned classifier (Rae et al. 2021 "Gopher" §A1.1; Raffel et al. 2020
"C4" §2.2): word-count bounds, mean-word-length bounds, symbol-to-word
ratio, bullet / ellipsis line ratios, alphabetic-word ratio, and
stopword presence. Documents failing any rule are dropped without ever
paying tokenization, hashing, or model cost.

Spark-first shape: EVERY signal is a narrow whole-stage-codegen
Column expression over the text column (split / higher-order filter /
regexp_extract_all) — zero shuffles, zero Python; at 100 TB the whole
battery rides the parquet scan. The reference
(Sevlac/data-integration-openfoodfacts) has no text-quality machinery;
this extends the engine along the LLM-training-data axis like
operators/quality_classifier.py, which it fronts in
plans/corpus_pipeline.py.

Determinism contract (CLAUDE.md): every threshold comparison is pure
INTEGER arithmetic — "mean word length in [3, 10]" is evaluated as
``3*n_words <= sum_word_len AND sum_word_len <= 10*n_words``, never as
a float division both engines would have to round identically. The
emitted signal columns are BIGINT in both engines; flags are booleans
derived from integer comparisons only.

Token convention matches functions/text_analysis.ws_tokens: split on
``\\s+`` after trim (DuckDB twin ``string_split_regex(trim(x),
'\\s+')``); empty text yields the single empty token in BOTH engines.
Text is coalesced to '' first so NULL text produces all-false flags,
not NULL ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "must contain at least 2 of these" stopword probe uses a
# fixed tiny list; we reuse the engine's existing sample
# (functions/text_analysis.STOPWORDS) so the battery and the ratio
# helpers agree on what a stopword is.
from ..functions.text_analysis import STOPWORDS

SYMBOL_PATTERN = r"#|\.\.\.|…"
BULLET_CHARS = ("-", "•", "*")


def rule_quality_signals(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_word_len_lo: int = 3,
    mean_word_len_hi: int = 10,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Append the per-document rule signals and flags.

    Added columns (all BIGINT signals / boolean flags):

    - ``n_words, sum_word_len, n_alpha_words, n_symbols, n_lines,
      n_bullet_lines, n_ellipsis_lines, n_stopwords``
    - ``r_word_count``   — min_words <= n_words <= max_words
    - ``r_mean_word_len``— lo*n_words <= sum_word_len <= hi*n_words
    - ``r_symbol_ratio`` — 10*n_symbols < n_words        (< 0.1)
    - ``r_bullet``       — 10*n_bullet_lines <= 9*n_lines (<= 0.9)
    - ``r_ellipsis``     — 10*n_ellipsis_lines <= 3*n_lines (<= 0.3)
    - ``r_alpha_words``  — 5*n_alpha_words >= 4*n_words  (>= 0.8)
    - ``r_stopwords``    — n_stopwords >= min_distinct_stopwords
    - ``pass_rules``     — AND of all seven
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(c), "\\s+")
    lines = F.split(c, "\n")
    n_words = F.size(toks).cast("long")
    sum_word_len = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.length(t),
    )
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))
    ).cast("long")
    n_sym = F.size(
        F.regexp_extract_all(c, F.lit(SYMBOL_PATTERN), F.lit(0))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin(*BULLET_CHARS),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.endswith(F.rtrim(ln), F.lit("..."))
            | F.endswith(F.rtrim(ln), F.lit("…")),
        )
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in STOPWORDS]),
        )
    ).cast("long")

    out = docs.select(
        "*",
        n_words.alias("n_words"),
        sum_word_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        n_sym.alias("n_symbols"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        n_stop.alias("n_stopwords"),
    )
    flags = out.select(
        "*",
        (
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
        ).alias("r_word_count"),
        (
            (F.lit(mean_word_len_lo) * F.col("n_words") <= F.col("sum_word_len"))
            & (F.col("sum_word_len") <= F.lit(mean_word_len_hi) * F.col("n_words"))
        ).alias("r_mean_word_len"),
        (F.lit(10) * F.col("n_symbols") < F.col("n_words")).alias(
            "r_symbol_ratio"
        ),
        (F.lit(10) * F.col("n_bullet_lines") <= F.lit(9) * F.col("n_lines")).alias(
            "r_bullet"
        ),
        (
            F.lit(10) * F.col("n_ellipsis_lines") <= F.lit(3) * F.col("n_lines")
        ).alias("r_ellipsis"),
        (F.lit(5) * F.col("n_alpha_words") >= F.lit(4) * F.col("n_words")).alias(
            "r_alpha_words"
        ),
        (F.col("n_stopwords") >= min_distinct_stopwords).alias("r_stopwords"),
    )
    return flags.select(
        "*",
        (
            F.col("r_word_count")
            & F.col("r_mean_word_len")
            & F.col("r_symbol_ratio")
            & F.col("r_bullet")
            & F.col("r_ellipsis")
            & F.col("r_alpha_words")
            & F.col("r_stopwords")
        ).alias("pass_rules"),
    )


def rule_pass_filter(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_word_len_lo: int = 3,
    mean_word_len_hi: int = 10,
    min_distinct_stopwords: int = 2,
) -> Column:
    """The battery as ONE boolean Column — for pipelines that only
    need the keep/drop decision and shouldn't materialize the eight
    signal columns (plans/corpus_pipeline.py stage 2). Same integer
    arithmetic as :func:`rule_quality_signals`."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(c), "\\s+")
    lines = F.split(c, "\n")
    n_words = F.size(toks).cast("long")
    sum_word_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast(
        "long"
    )
    n_sym = F.size(
        F.regexp_extract_all(c, F.lit(SYMBOL_PATTERN), F.lit(0))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.substring(F.ltrim(ln), 1, 1).isin(*BULLET_CHARS),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda ln: F.endswith(F.rtrim(ln), F.lit("..."))
            | F.endswith(F.rtrim(ln), F.lit("…")),
        )
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower),
            F.array(*[F.lit(w) for w in STOPWORDS]),
        )
    ).cast("long")
    return (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (F.lit(mean_word_len_lo) * n_words <= sum_word_len)
        & (sum_word_len <= F.lit(mean_word_len_hi) * n_words)
        & (F.lit(10) * n_sym < n_words)
        & (F.lit(10) * n_bullet <= F.lit(9) * n_lines)
        & (F.lit(10) * n_ellipsis <= F.lit(3) * n_lines)
        & (F.lit(5) * n_alpha >= F.lit(4) * n_words)
        & (n_stop >= min_distinct_stopwords)
    )


# ---------------------------------------------------------------------------
# DuckDB twins (kept next to the operator so the Spark expression and
# its SQL mirror evolve together; consumed by the q148/q158 oracles).

_STOPWORD_SQL_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def rule_signals_sql(text_expr: str) -> dict[str, str]:
    """SQL expressions (DuckDB) for each BIGINT signal, mirroring
    :func:`rule_quality_signals` 1:1 over ``text_expr``."""
    c = f"COALESCE({text_expr}, '')"
    toks = f"string_split_regex(trim({c}), '\\s+')"
    lines = f"string_split({c}, chr(10))"
    return {
        "n_words": f"CAST(len({toks}) AS BIGINT)",
        "sum_word_len": (
            "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({toks}, x -> CAST(len(x) AS BIGINT))), "
            "(a, b) -> a + b) AS BIGINT)"
        ),
        "n_alpha_words": (
            f"CAST(len(list_filter({toks}, "
            "x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)"
        ),
        "n_symbols": (
            f"CAST(len(regexp_extract_all({c}, '#|\\.\\.\\.|…')) AS BIGINT)"
        ),
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_bullet_lines": (
            f"CAST(len(list_filter({lines}, l -> list_contains("
            "['-', '•', '*'], substring(ltrim(l), 1, 1)))) AS BIGINT)"
        ),
        "n_ellipsis_lines": (
            f"CAST(len(list_filter({lines}, l -> ends_with(rtrim(l), "
            "'...') OR ends_with(rtrim(l), '…'))) AS BIGINT)"
        ),
        "n_stopwords": (
            f"CAST(len(list_intersect(list_transform({toks}, "
            f"x -> lower(x)), {_STOPWORD_SQL_LIST})) AS BIGINT)"
        ),
    }


def rule_flags_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    mean_word_len_lo: int = 3,
    mean_word_len_hi: int = 10,
    min_distinct_stopwords: int = 2,
) -> dict[str, str]:
    """SQL boolean flags over the signal COLUMN NAMES emitted by
    :func:`rule_signals_sql` (evaluate signals in a prior CTE, then
    these in the next) — same integer arithmetic as the Spark side."""
    return {
        "r_word_count": (
            f"(n_words >= {min_words} AND n_words <= {max_words})"
        ),
        "r_mean_word_len": (
            f"({mean_word_len_lo} * n_words <= sum_word_len "
            f"AND sum_word_len <= {mean_word_len_hi} * n_words)"
        ),
        "r_symbol_ratio": "(10 * n_symbols < n_words)",
        "r_bullet": "(10 * n_bullet_lines <= 9 * n_lines)",
        "r_ellipsis": "(10 * n_ellipsis_lines <= 3 * n_lines)",
        "r_alpha_words": "(5 * n_alpha_words >= 4 * n_words)",
        "r_stopwords": f"(n_stopwords >= {min_distinct_stopwords})",
    }


def rule_pass_ctes(
    src: str, out: str, text_expr: str = "text", **thresholds: int
) -> str:
    """Two CTE definitions (splice into a WITH list) filtering ``src``
    by :func:`rule_pass_filter`'s battery: ``{out}__sig`` computes the
    signals AS NAMED COLUMNS over ``src``, ``{out}`` applies the flag
    predicate over those names and projects the signals back out
    (DuckDB ``* EXCLUDE``). Flags bind to signal columns by SQL name
    resolution — no textual substitution, so a future signal whose
    name embeds another's cannot corrupt the predicate (round-7
    ADVICE; the same two-CTE shape q158's oracle uses). ``src`` must
    not already carry columns named like the signals."""
    sig = rule_signals_sql(text_expr)
    flags = rule_flags_sql(**thresholds)
    sig_cols = ",\n    ".join(f"({v}) AS {k}" for k, v in sig.items())
    pred = "\n   AND ".join(flags.values())
    return (
        f"{out}__sig AS (SELECT *,\n    {sig_cols}\n  FROM {src}),\n"
        f"{out} AS (SELECT * EXCLUDE ({', '.join(sig)})\n"
        f"  FROM {out}__sig WHERE {pred})"
    )
