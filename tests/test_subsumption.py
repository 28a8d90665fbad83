"""Subsumption pruning (plans/subsumption_queries.py rules over
operators/containment.py): one-of-each-mutual-pair survival, best-host
attribution, and no self-hosting."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_integration_openfoodfacts_spark.operators.containment import (
    containment_pairs,
)

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _prune(spark, rows, t=90):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = containment_pairs(docs, "doc_id", "text", 3, t)
    hosts = pairs.filter(
        (F.col("size_b") > F.col("size_a"))
        | (
            (F.col("size_b") == F.col("size_a"))
            & (
                F.md5(F.col("id_b").cast("string"))
                < F.md5(F.col("id_a").cast("string"))
            )
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("size_b").desc(), F.md5(F.col("id_b").cast("string"))
    )
    out = (
        hosts.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(F.col("id_a").alias("doc_id"), F.col("id_b").alias("host_id"))
    )
    return {r["doc_id"]: r["host_id"] for r in out.collect()}


def test_quote_attributed_to_largest_host(spark):
    quote = " ".join(WORDS[:5])
    host_small = quote + " " + " ".join(f"x{i}" for i in range(10))
    host_big = quote + " " + " ".join(f"y{i}" for i in range(40))
    got = _prune(
        spark, [(1, quote), (2, host_small), (3, host_big)], t=100
    )
    # the quote drops once, attributed to the LARGEST host
    assert got == {1: 3}


def test_exactly_one_of_mutual_pair_survives(spark):
    text = " ".join(WORDS)
    got = _prune(spark, [(1, text), (2, text)], t=100)
    assert len(got) == 1
    (dropped, host), = got.items()
    assert {dropped, host} == {1, 2}
    # the md5 tiebreak decides the direction deterministically
    winner = min((1, 2), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert host == winner and dropped != winner


def test_unrelated_docs_untouched(spark):
    got = _prune(
        spark,
        [(1, " ".join(WORDS)), (2, "totally different words right here")],
        t=90,
    )
    assert got == {}
