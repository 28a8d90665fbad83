"""Exact phrase search — positional lexical retrieval.

The retrieval family has ranked keyword search (q96 BM25) and
substring/span machinery; what was missing is the PHRASE primitive:
"these words, adjacent, in this order", the operator behind quoted
queries, boilerplate-sentence audits ("click here to subscribe") and
contamination checks for exact prompt strings.

Spark-first shape: a phrase of n tokens IS an n-gram equality test, so
matching is a NARROW per-row expression — tokenize, enumerate n-grams
with their positions (`transform` over a `sequence`), keep the ones
equal to the phrase (`filter` on the struct array) — no explode, no
join, no UDF; the whole match runs inside whole-stage codegen and the
scan only reads the text column. Per-document term frequency and first
hit position fall out of the surviving array. Ranking is the engine's
top-k convention (tf desc, md5 tiebreak, row_number window partitioned
by phrase — each phrase ranks independently and in parallel).

At 100 TB this is one pass over the corpus per phrase BATCH (all
phrases evaluated in the same projection), with the usual pushdown:
a pre-filter on any partition/metadata column reaches the scan
untouched since matching adds no shuffle before the final top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["phrase_hits", "phrase_topk"]


def _hits_col(text_col: str, phrase: str) -> Column:
    """Array of 1-based token positions where ``phrase`` starts."""
    toks = F.split(F.col(text_col), " ")
    n = len(phrase.split(" "))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice(toks, i, n)).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
    return F.filter(grams, lambda x: x["g"] == F.lit(phrase))


def phrase_hits(
    df: DataFrame, id_col: str, text_col: str, phrase: str
) -> DataFrame:
    """(id, tf, first_pos) for every document containing ``phrase``
    (whitespace tokens, adjacent, in order; 1-based positions)."""
    if not phrase or " " * len(phrase) == phrase:
        raise ValueError("phrase must contain at least one token")
    hits = _hits_col(text_col, phrase)
    return (
        df.select(
            F.col(id_col),
            F.size(hits).cast("long").alias("tf"),
            F.get(hits, 0)["pos"].cast("long").alias("first_pos"),
        )
        .filter(F.col("tf") > 0)
    )


def phrase_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: list[str],
    k: int,
) -> DataFrame:
    """Top-``k`` documents per phrase: (phrase, rank, id, tf,
    first_pos), ranked tf-desc with the md5 unique tiebreak. All
    phrases are matched in ONE pass over the corpus (each is a narrow
    column on the same scan); only the per-phrase top-k pays a
    shuffle."""
    if not phrases:
        raise ValueError("phrase_topk needs at least one phrase")
    # ONE projection evaluates every phrase on the same scan; the
    # per-phrase rows come from exploding a phrases-sized array per
    # document (narrow), not from unioning one scan per phrase.
    stats = F.array(
        *[
            F.struct(
                F.lit(p).alias("phrase"),
                F.size(_hits_col(text_col, p)).cast("long").alias("tf"),
                F.get(_hits_col(text_col, p), 0)["pos"]
                .cast("long")
                .alias("first_pos"),
            )
            for p in phrases
        ]
    )
    per = (
        df.select(F.col(id_col), F.explode(stats).alias("__h"))
        .select(
            F.col("__h.phrase").alias("phrase"),
            id_col,
            F.col("__h.tf").alias("tf"),
            F.col("__h.first_pos").alias("first_pos"),
        )
        .filter(F.col("tf") > 0)
    )
    w = Window.partitionBy("phrase").orderBy(
        F.col("tf").desc(), F.md5(F.col(id_col).cast("string"))
    )
    return (
        per.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("phrase", "rank", id_col, "tf", "first_pos")
    )
