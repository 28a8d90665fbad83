"""Engine UDF registry: expose the Python-side functions to Spark SQL.

SURVEY.md §2.7 F1: the reference's one UDF must be available to the SQL
surface as well as the DataFrame API. After ``register_udfs(spark)``:

    SELECT ascii_fold(product_name) FROM silver.products
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .text_normalize import ascii_fold


def register_udfs(spark: SparkSession) -> None:
    spark.udf.register("ascii_fold", ascii_fold)
