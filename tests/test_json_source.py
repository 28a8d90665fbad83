"""JSONL source: schema-explicit round trip + corrupt-line quarantine."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_integration_openfoodfacts_spark.sources.json_source import (
    read_jsonl,
    write_jsonl,
)
from tests.conftest import SF_DIR

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_round_trip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert back.schema.fieldNames() == docs.schema.fieldNames()
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    path = str(tmp_path / "mixed.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n')
        f.write("this is not json\n")
        f.write('{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n')
    good = read_jsonl(spark, path, DOC_SCHEMA)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    kept = read_jsonl(spark, path, DOC_SCHEMA, keep_corrupt=True)
    corrupt = [r for r in kept.collect() if r._corrupt_record is not None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record
    assert os.path.exists(path)
