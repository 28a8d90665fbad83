"""Cleansing operators (reference P5, P6, F2-F5).

All pure Column expressions — they stay inside whole-stage codegen, no
Python boundary is crossed, and Catalyst can push/prune around them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference invalid-token list, pipeline_etl.ipynb:279-298 (P5).
INVALID_TOKENS = ("undefined", "null", "unknown", "none", "n/a", "")


def valid_expr(col: Column | str, invalid: tuple[str, ...] = INVALID_TOKENS) -> Column:
    """NULL out placeholder garbage: value is kept iff it is non-null and
    its lowercased form is not one of the invalid tokens.

    Reference: pipeline_etl.ipynb:279-298.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull() & ~F.lower(c).isin(*invalid), c)


def impute_with_default(
    main: Column | str,
    default: str,
    fallback: Column | str | None = None,
    invalid: tuple[str, ...] = INVALID_TOKENS,
) -> Column:
    """``coalesce(valid(main), valid(fallback), default)``.

    Reference P6 (pipeline_etl.ipynb:268-302): e.g. ``categories_en``
    falls back to ``categories`` then to ``"non classe"``.
    """
    parts = [valid_expr(main, invalid)]
    if fallback is not None:
        parts.append(valid_expr(fallback, invalid))
    parts.append(F.lit(default))
    return F.coalesce(*parts)


def clean_text_chain(col: Column | str, max_len: int | None = None) -> Column:
    """Native text-cleaning chain (reference F2, pipeline_etl.ipynb:212-234):
    strip non-alphanumerics, lowercase, trim, collapse whitespace,
    optionally truncate (F5). The accent-folding UDF step lives in
    ``functions.text_normalize`` and composes in front of this.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[^a-zA-Z0-9 ]", "")
    c = F.regexp_replace(F.trim(F.lower(c)), "\\s+", " ")
    if max_len is not None:
        c = F.substring(c, 1, max_len)
    return c


def extract_category_head(col: Column | str) -> Column:
    """First hyphen-segment of a category path with a 2-letter language
    prefix (``en:``) stripped. Reference F4, pipeline_etl.ipynb:245-250.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.split(c, "-").getItem(0), "^[a-z]{2}:", "")
