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


# (applicationId, dataset_key, n_merges, text_col) -> merge list.
# Same invalidation reasoning as clustering._CENTERS_MEMO: the fit is
# deterministic for fixed input, tiny (n rows), and consumed by both
# the merge-table query (q137) and the encoder (q138) — refitting per
# consumer would re-run the rounds for identical output.
_MERGES_MEMO: dict[tuple, list] = {}


def learn_bpe_merges_cached(
    docs: DataFrame,
    dataset_key: str,
    n_merges: int = 3,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    spark = docs.sparkSession
    key = (
        spark.sparkContext.applicationId, dataset_key, n_merges, text_col,
    )
    if key not in _MERGES_MEMO:
        _MERGES_MEMO[key] = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in learn_bpe_merges(docs, n_merges, text_col).collect()
        ]
    return _MERGES_MEMO[key]


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a learned merge table: every word splits
    to characters, the merges apply in rank order (plain left-to-right
    replace — the exact inverse-free BPE inference rule matching how
    the fit applied them), and the doc's token stream is the flattened
    per-word symbol arrays. Entirely narrow expressions — zero
    shuffle; at 100 TB this is scan-bound like tokenize.py.

    Returns (id_col, tokens array<string>).
    """

    def encode_word(w):
        s = F.array_join(F.split(w, ""), SEP)
        for left, right in merges:
            s = F.replace(s, F.lit(left + SEP + right), F.lit(left + right))
        return F.split(s, SEP)

    toks = F.filter(
        F.flatten(
            F.transform(F.split(F.col(text_col), " "), encode_word)
        ),
        lambda t: t != "",
    )
    return docs.select(F.col(id_col), toks.alias("tokens"))


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
