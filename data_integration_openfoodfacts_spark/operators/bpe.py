"""Distributed BPE merge learning — tokenizer FITTING, the stage the
rest of the tokenize/encode surface (functions/tokenize.py) consumes a
vocabulary from.

Textbook byte-pair encoding (Sennrich et al. 2016), Spark-first:

1. one corpus pass builds the WORD-FREQUENCY table (classic BPE's
   working set — vocabulary-sized, not corpus-sized);
2. each merge round is ONE distributed aggregation over that table
   (adjacent-symbol pair counts weighted by word frequency, map-side
   combined) + a driver-side argmax of a single row + a NARROW
   string-replace applying the merge.

Scale posture: the corpus is touched exactly once (step 1); every
round after that costs O(|vocab|), and |vocab| is millions of rows at
100 TB, not billions. The driver receives one (pair, count) row per
round — the same bounded-collect contract as clustering/pca.
Production vocabularies (30k+ merges) batch the application step
(apply the top-B non-conflicting merges per round) — the round
structure here is the unbatched reference semantics the q137 oracle
can replay exactly (unrolled rounds, q104-style).

Cross-engine exactness: symbols are joined with the unit separator
(U+001F) and pair keys with the record separator (U+001E) — neither
occurs in natural text; counts are exact integer sums; the argmax
tiebreak is (count DESC, pair-string ASC) under binary collation; the
merge application is plain (non-regex) left-to-right replace, which
Spark's ``replace`` and DuckDB's ``replace`` implement identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: joins symbols inside a word ("h\x1fe\x1fl\x1fl\x1fo")
SEP = "\x1f"
#: joins the two symbols of a candidate pair key
PJ = "\x1e"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace-split words — BPE's working set."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns a
    DataFrame (rank, left, right, pair_count) — the merge table a
    tokenizer ships. rank is 1-based merge order."""
    spark = docs.sparkSession
    seqs = (
        word_freq_table(docs, text_col)
        .select(
            F.array_join(F.split("word", ""), SEP).alias("seq"), "cnt"
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        arr = F.split("seq", SEP)
        pairs = (
            seqs.filter(F.size(arr) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(arr) - 1),
                        lambda i: F.concat(
                            F.element_at(arr, i),
                            F.lit(PJ),
                            F.element_at(arr, i + 1),
                        ),
                    )
                ).alias("pair"),
                "cnt",
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["pair"].split(PJ)
        merges.append((rank, left, right, best[0]["c"]))
        seqs = seqs.select(
            F.replace(
                "seq", F.lit(left + SEP + right), F.lit(left + right)
            ).alias("seq"),
            "cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )
