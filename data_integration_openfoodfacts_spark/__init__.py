"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference repo ``Sevlac/data-integration-openfoodfacts``.

The reference (see SURVEY.md) is a Bronze->Silver->Gold medallion ETL over
the OpenFoodFacts product dump plus six OLAP queries that run in MySQL.
This package re-expresses every operator Spark-first:

- ``session``    : tuned SparkSession factory (UTC, AQE, Arrow).
- ``sources``    : CSV / Parquet readers and table sinks (replaces JDBC).
- ``functions``  : text normalization (the reference's only UDF), text
                   analysis, and vector math helpers.
- ``operators``  : cleaning, validation, dedup, surrogate keys, DQ checks,
                   similarity search.
- ``plans``      : the analytics queries + the medallion pipeline runner.
- ``streaming``  : Structured Streaming ingestion (reference's documented
                   future CDC mode, architecture_notes.md:263-331).
- ``multimodal`` : opaque-binary column plumbing for image/audio payloads.

Everything is public PySpark DataFrame/SQL API; no custom Catalyst rules
are needed (SURVEY.md §4).
"""

__version__ = "0.1.0"
