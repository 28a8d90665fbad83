"""Shared numeric helpers for cross-engine determinism."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec18(col: Column | str) -> Column:
    """Cast to decimal(18,6) — THE pre-summation cast that makes
    aggregate sums order-independent and therefore hash-identical
    across engines and partitionings. Keep the precision in sync with
    the DuckDB oracles' ``CAST(... AS DECIMAL(18,6))``."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")
