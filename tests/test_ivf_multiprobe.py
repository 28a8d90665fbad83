"""IVF nprobe recall knob (`operators/similarity.py::ivf_topk`):
multi-probe recall vs exact top-k is monotone in nprobe, and
nprobe = num_centroids degrades to the exact scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)
from data_integration_openfoodfacts_spark.sources.parquet_source import (
    load_table,
)

SF = "/root/testdata/sf0.001"


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_nprobe_recall_monotone_to_exact(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    exact = set(_ids(cosine_topk(emb, query_vec_id=0, k=10)))
    recalls = []
    for nprobe in (1, 3, 8):
        got = set(
            _ids(ivf_topk(emb, cents, query_vec_id=0, k=10, nprobe=nprobe))
        )
        recalls.append(len(got & exact))
    assert recalls == sorted(recalls), recalls
    # probing every list IS the exact scan
    assert recalls[-1] == 10
