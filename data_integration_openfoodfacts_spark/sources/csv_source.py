"""CSV source with the reference's Bronze read semantics.

Reference operator S1 (pipeline_etl.ipynb:95-102): tab-separated, header,
quote+escape ``"``, multiLine, PERMISSIVE, schema-on-read (all string —
``inferSchema`` deliberately off so numeric semantics are applied later,
explicitly, in Silver).

Scale note: ``multiLine=True`` makes a CSV file non-splittable (one task
per file). For a 100 TB bronze drop the ingest contract is "many files",
so parallelism comes from file count, not intra-file splits; flip
``multi_line=False`` when the payload is known to have no embedded
newlines to restore splittable scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_openfoodfacts_csv(
    spark: SparkSession,
    path: str,
    sep: str = "\t",
    multi_line: bool = True,
) -> DataFrame:
    return (
        spark.read.options(
            header=True,
            sep=sep,
            quote='"',
            escape='"',
            multiLine=multi_line,
            mode="PERMISSIVE",
        ).csv(path)
    )
