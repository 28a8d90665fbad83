"""Unicode -> ASCII normalization (the reference's only UDF, F1/U1).

Reference: pipeline_etl.ipynb:205-210 — a row-at-a-time Python UDF doing
``NFKC -> NFD -> drop non-ASCII`` ("Côte d'Or™" -> "Cote dOr",
quality_report.md:58-80). That UDF is the reference's single biggest perf
sink (per-row pickling, python worker per task).

Here it is a **pandas UDF**: Arrow-batched columnar transfer, one Python
call per ~10k-row batch, ~10-100x faster, with byte-identical semantics
(same CPython ``unicodedata``). There is no pure-SQL equivalent of full
NFKC+NFD folding, so this is the sanctioned Python escape hatch; keep it
out of hot paths that don't need accent folding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _make_ascii_fold():
    """Build the pandas UDF from a *nested* function: cloudpickle
    serializes nested functions by value, so Spark's Python workers do
    not need this package importable on their own sys.path (the driver
    harness may launch from any cwd)."""

    def fold_series(batch):
        import unicodedata

        def fold(s):
            if s is None:
                return None
            # Fast path: NFKC→NFD→ascii-ignore is the identity on pure
            # ASCII (every ASCII char is normalization-invariant), and
            # str.isascii() is a single C-level scan — real-world text
            # columns are mostly ASCII, so this skips the two normalize
            # passes + encode/decode round trip for most rows.
            if s.isascii():
                return s
            return (
                unicodedata.normalize("NFD", unicodedata.normalize("NFKC", s))
                .encode("ascii", "ignore")
                .decode("ascii")
            )

        return batch.map(fold)

    return pandas_udf(fold_series, StringType())


ascii_fold = _make_ascii_fold()

# Characters NFD cannot decompose (no canonical decomposition exists) —
# the reference's ascii-ignore silently DELETES them ("smørrebrød" ->
# "smrrebrd", Ladefoged products in the source data). The mapped variant
# transliterates them first; kept separate so ``ascii_fold`` stays
# byte-identical to the reference (quality_report.md:58-80 vectors).
NFD_RESISTANT_MAP = {
    "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "œ": "oe", "Œ": "OE",
    "ß": "ss", "þ": "th", "Þ": "Th", "ð": "d", "Ð": "D",
    "đ": "d", "Đ": "D", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
}


def _make_ascii_fold_mapped():
    fallback = dict(NFD_RESISTANT_MAP)

    def fold_series(batch):
        import unicodedata

        table = str.maketrans(fallback)

        def fold(s):
            if s is None:
                return None
            if s.isascii():  # identity on ASCII — see ascii_fold
                return s
            return (
                unicodedata.normalize(
                    "NFD", unicodedata.normalize("NFKC", s)
                )
                .translate(table)
                .encode("ascii", "ignore")
                .decode("ascii")
            )

        return batch.map(fold)

    return pandas_udf(fold_series, StringType())


ascii_fold_mapped = _make_ascii_fold_mapped()


def normalized_text_chain(col: Column | str, max_len: int | None = None) -> Column:
    """Full reference cleaning chain F1+F2: accent-fold then strip
    non-alphanumerics, lowercase, trim, collapse spaces, truncate.
    Golden vectors in quality_report.md:73-79.
    """
    from ..operators.cleaning import clean_text_chain

    c = F.col(col) if isinstance(col, str) else col
    return clean_text_chain(ascii_fold(c), max_len=max_len)
