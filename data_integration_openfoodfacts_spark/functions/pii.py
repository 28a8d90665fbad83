"""PII redaction for training-data pipelines: email / phone / IPv4 /
SSN patterns replaced with typed placeholder tokens.

Pure ``regexp_replace`` chains — whole-stage codegen, no Python
boundary, scan-speed at 100 TB. Patterns deliberately use the syntax
subset shared by Java regex (Spark) and RE2 (DuckDB): no backrefs, no
lookaround — so the DuckDB oracle twin (``regexp_replace(x, p, r,
'g')``) is bit-identical.

A production deployment extends PATTERNS per jurisdiction (IBANs,
national ids); the operator shape — an ordered fold of (pattern,
replacement) — is the stable part. Order matters: emails are redacted
before phone numbers so digits inside an address are not re-matched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered (name, pattern, replacement). Kept RE2-compatible.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "[SSN]",
    ),
    (
        "phone",
        # no leading \b: the position before '(' in '(555) ...' is not a
        # word boundary, which would silently skip parenthesized area
        # codes; the trailing \b still anchors the end.
        r"(\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "[PHONE]",
    ),
    (
        "ipv4",
        r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "[IP]",
    ),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: Column | str) -> Column:
    """Apply every PATTERNS entry in order; returns the scrubbed text."""
    out = _c(col)
    for _, pattern, repl in PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_match_count(col: Column | str) -> Column:
    """Total PII matches in the text (pre-redaction), summed over
    pattern types in PATTERNS order — the audit metric a scrub job
    reports per shard. Counted on progressively-redacted text with the
    same fold as :func:`redact_pii`, so overlapping patterns are not
    double-counted."""
    total = F.lit(0).cast("long")
    cur = _c(col)
    for _, pattern, repl in PATTERNS:
        total = total + F.size(
            F.regexp_extract_all(cur, F.lit(pattern), 0)
        ).cast("long")
        cur = F.regexp_replace(cur, pattern, repl)
    return total


def duckdb_redact_sql(expr: str) -> str:
    """The DuckDB twin of :func:`redact_pii` as a nested-call SQL
    expression over ``expr`` — used by oracle queries."""
    out = expr
    for _, pattern, repl in PATTERNS:
        p = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out


def duckdb_count_sql(expr: str) -> str:
    """DuckDB twin of :func:`pii_match_count`."""
    total = []
    cur = expr
    for _, pattern, repl in PATTERNS:
        p = pattern.replace("'", "''")
        total.append(f"len(regexp_extract_all({cur}, '{p}'))")
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    return "CAST(" + " + ".join(total) + " AS BIGINT)"


def k_anonymity_report(df, qi_cols: list[str], k: int = 5):
    """Privacy-risk report over quasi-identifier columns: every
    equivalence class (distinct QI combination) whose row count is
    below ``k`` — records in those classes are re-identifiable by the
    QI tuple (the k-anonymity criterion anonymization must satisfy
    before a corpus ships).

    Returns (qi_cols..., class_size) for the violating classes.
    Scale: one hash aggregation on the QI key — partial map-side
    combine, output bounded by |violating classes|.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )
