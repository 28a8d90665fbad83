"""DQ suite over pipeline output + parquet compaction round-trip."""

from __future__ import annotations

import os
import pathlib

from data_integration_openfoodfacts_spark.operators.dq_suite import run_dq_suite
from data_integration_openfoodfacts_spark.plans.pipeline import run_pipeline
from data_integration_openfoodfacts_spark.sources.csv_source import (
    read_openfoodfacts_csv,
)
from data_integration_openfoodfacts_spark.sources.sinks import compact_parquet
from tests.test_pipeline import HEADER, ROWS


def test_dq_suite_passes_on_pipeline_output(spark, tmp_path):
    path = os.path.join(str(tmp_path), "p.tsv")
    with open(path, "w", encoding="utf-8") as f:
        f.write(HEADER + "\n" + "\n".join(ROWS) + "\n")
    res = run_pipeline(spark, read_openfoodfacts_csv(spark, path))
    report = run_dq_suite(res.tables)
    assert report["passed"], report
    assert len(report["checks"]) == 9


def test_dq_suite_catches_violation(spark, tmp_path):
    path = os.path.join(str(tmp_path), "p.tsv")
    with open(path, "w", encoding="utf-8") as f:
        f.write(HEADER + "\n" + "\n".join(ROWS) + "\n")
    res = run_pipeline(spark, read_openfoodfacts_csv(spark, path))
    tables = dict(res.tables)
    # sabotage: duplicate the silver table -> parity + uniqueness break
    tables["silver_products"] = tables["silver_products"].unionAll(
        tables["silver_products"]
    )
    report = run_dq_suite(tables)
    assert not report["passed"]
    assert report["checks"]["t1_unique_silver_code"] > 0


def test_compact_parquet_reduces_files(spark, tmp_path):
    target = str(tmp_path / "frag")
    ev = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    ev.repartition(17).write.parquet(target)
    before = len(list(pathlib.Path(target).rglob("*.parquet")))
    assert before >= 17
    n = compact_parquet(spark, target, target_file_mb=256)
    after = len(list(pathlib.Path(target).rglob("*.parquet")))
    assert after == n == 1
    assert spark.read.parquet(target).count() == ev.count()
