"""Deterministic surrogate-key generation (reference §2.12).

The reference lets MySQL AUTO_INCREMENT mint ``*_sk`` keys and then reads
the tables back over JDBC to learn them (pipeline_etl.ipynb:570-571,644).
In-engine we mint keys directly, removing the write->read-back round trip.

Two strategies:

- ``row_number`` over the natural-key order: fully deterministic (required
  for golden/oracle tests) but plans a single-partition global sort — fine
  for dimensions (they are small by definition), wrong for a 100 TB fact.
- ``hash`` of the natural key (xxhash64): deterministic AND embarrassingly
  parallel — no shuffle at all. Collision odds over 64 bits are ~n²/2⁶⁵
  (≈0.003 for 10 billion keys); pair with an ``assert_unique`` DQ check.

``monotonically_increasing_id`` is deliberately not offered: it is
partition-layout dependent, so re-runs produce different keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    key_col: str,
    natural_keys: Sequence[str],
    strategy: str = "row_number",
) -> DataFrame:
    if strategy == "row_number":
        w = Window.orderBy(*[F.col(k) for k in natural_keys])
        return df.withColumn(key_col, F.row_number().over(w).cast("long"))
    if strategy == "hash":
        return df.withColumn(key_col, F.xxhash64(*[F.col(k) for k in natural_keys]))
    raise ValueError(f"unknown strategy {strategy!r}")
