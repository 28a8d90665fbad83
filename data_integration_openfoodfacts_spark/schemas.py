"""Explicit schemas for the Silver and Gold layers.

Derived from the reference's MySQL DDL (tools/database.py:44-151) with
the Spark-native type upgrades from SURVEY.md §1.2: FLOAT -> double,
JSON comma-list -> array<string>, AUTO_INCREMENT -> engine-minted
surrogate keys. VARCHAR lengths are enforced by ``substring`` in the
pipeline, not by the type system.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The 17 Bronze columns the pipeline consumes (pipeline_etl.ipynb:167-173),
# post hyphen->underscore rename (:179-181).
SILVER_INPUT_COLUMNS = [
    "code",
    "product_name",
    "brands",
    "main_category",
    "categories_en",
    "countries_en",
    "last_modified_t",
    "nutriscore_grade",
    "energy-kcal_100g",
    "fat_100g",
    "saturated-fat_100g",
    "sugars_100g",
    "salt_100g",
    "proteins_100g",
    "fiber_100g",
    "sodium_100g",
    "completeness",
]

NUTRIENT_COLUMNS = [
    "energy_kcal_100g",
    "fat_100g",
    "saturated_fat_100g",
    "sugars_100g",
    "salt_100g",
    "sodium_100g",
    "proteins_100g",
    "fiber_100g",
]

SILVER_SCHEMA = StructType(
    [
        StructField("code", StringType()),
        StructField("product_name", StringType()),
        StructField("brands", StringType()),
        StructField("main_category", StringType()),
        StructField("categories_en", StringType()),
        StructField("countries_en", ArrayType(StringType())),
        StructField("last_modified_t", LongType()),
        StructField("last_modified_ts", TimestampType()),
        StructField("last_modified_date", DateType()),
        StructField("nutriscore_grade", StringType()),
        StructField("energy_kcal_100g", DoubleType()),
        StructField("energy_kj_100g", DoubleType()),
        StructField("fat_100g", DoubleType()),
        StructField("saturated_fat_100g", DoubleType()),
        StructField("sugars_100g", DoubleType()),
        StructField("salt_100g", DoubleType()),
        StructField("sodium_100g", DoubleType()),
        StructField("proteins_100g", DoubleType()),
        StructField("fiber_100g", DoubleType()),
        StructField("completeness", DoubleType()),
    ]
)

DIM_TIME_SCHEMA = StructType(
    [
        StructField("time_sk", LongType()),  # degenerate: == last_modified_t
        StructField("date", DateType()),
        StructField("year", LongType()),
        StructField("month", LongType()),
        StructField("day", LongType()),
        StructField("week", LongType()),
        StructField("iso_week", LongType()),
    ]
)

DIM_BRAND_SCHEMA = StructType(
    [
        StructField("brand_sk", LongType()),
        StructField("brand_name", StringType()),
    ]
)

DIM_CATEGORY_SCHEMA = StructType(
    [
        StructField("category_sk", LongType()),
        StructField("category_name", StringType()),
        StructField("parent_category_name", StringType()),
    ]
)

DIM_COUNTRY_SCHEMA = StructType(
    [
        StructField("country_sk", LongType()),
        StructField("country_name", StringType()),
    ]
)

DIM_PRODUCT_SCHEMA = StructType(
    [
        StructField("product_sk", LongType()),
        StructField("code", StringType()),
        StructField("product_name", StringType()),
        StructField("brand_sk", LongType()),
        StructField("primary_category_sk", LongType()),
        StructField("countries_multi_name", ArrayType(StringType())),
    ]
)

FACT_SCHEMA = StructType(
    [
        StructField("product_sk", LongType()),
        StructField("time_sk", LongType()),
        StructField("energy_kcal_100g", DoubleType()),
        StructField("fat_100g", DoubleType()),
        StructField("saturated_fat_100g", DoubleType()),
        StructField("sugars_100g", DoubleType()),
        StructField("salt_100g", DoubleType()),
        StructField("sodium_100g", DoubleType()),
        StructField("proteins_100g", DoubleType()),
        StructField("fiber_100g", DoubleType()),
        StructField("nutriscore_grade", StringType()),
        StructField("completeness_score", DoubleType()),
    ]
)
