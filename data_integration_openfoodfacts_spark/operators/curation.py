"""End-to-end training-corpus curation: the composition a 100 TB
training-data pipeline actually runs, built entirely from this engine's
oracle-proven operators:

1. quality gate   — ``functions/text_analysis.quality_score`` (q21);
2. decontaminate  — anti-join against ``benchmark_contamination``'s
                    flagged ids (q46);
3. exact dedup    — keep the lowest id per md5(text) (q8-family
                    keep-latest window, md5 engine-neutral);
4. split          — ``operators/splits.deterministic_split`` (q48).

Each stage is narrow or single-shuffle: the quality gate is per-row,
decontamination joins only the tiny benchmark shingle set (broadcast),
dedup shuffles once on the text hash, and the split is per-row again.
Nothing here is quadratic in corpus size; the near-dup stages (MinHash
/ SimHash / embedding LSH) compose in front of step 3 when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import quality_score
from .dedup import dedup_keep_latest
from .similarity_dedup import benchmark_contamination
from .splits import deterministic_split


def curate_training_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: int = 2,
    n: int = 3,
    min_shared: int = 5,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Returns (id, quality_score, bucket, split) for the curated
    corpus: quality-gated, benchmark-decontaminated, exactly deduped
    (lowest id per identical text wins), split-assigned."""
    gated = corpus.withColumn("quality_score", quality_score(text_col)).filter(
        F.col("quality_score") >= min_quality
    )
    contaminated = benchmark_contamination(
        corpus, benchmark, id_col, text_col, n=n, min_shared=min_shared
    ).select(id_col)
    clean = gated.join(contaminated, id_col, "left_anti")
    deduped = dedup_keep_latest(
        clean.withColumn("__fp", F.md5(F.col(text_col))),
        keys=["__fp"],
        order_by=[F.col(id_col).asc()],
    ).drop("__fp")
    return deterministic_split(
        deduped, id_col, train_pct=train_pct, val_pct=val_pct, salt=salt
    ).select(id_col, "quality_score", "bucket", "split")


def prepare_training_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_distinct_ratio: float = 0.35,
    budget: int = 2048,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Stage 2 of corpus curation — from curated documents to
    training-ready shards:

    5. repetition gate — drop boilerplate/generated spam whose
       distinct-token ratio falls below ``min_distinct_ratio`` (q61
       signals; per-row, no shuffle);
    6. PII scrub      — ``functions/pii.redact_pii`` + audit count
       (q67; per-row regexp chain);
    7. shard          — stable md5 shard in [0, n_shards) (q62);
    8. pack           — token-budget running-sum packing per shard
       (q68; one window per shard, parallel across shards).

    Returns (id, clean_text, n_pii, n_tokens, shard, pack_id). The only
    shuffle in the whole stage is the shard-window partition.
    """
    from ..functions.pii import pii_match_count, redact_pii
    from ..functions.text_analysis import distinct_element_ratio, ws_tokens
    from .packing import pack_by_token_budget
    from .sampling import assign_shards

    arrs = df.select(
        id_col,
        F.col(text_col).alias("__text"),
        ws_tokens(text_col).alias("__t"),
    )
    gated = arrs.filter(
        distinct_element_ratio(F.col("__t")) >= min_distinct_ratio
    )
    scrubbed = gated.select(
        id_col,
        redact_pii("__text").alias("clean_text"),
        pii_match_count("__text").alias("n_pii"),
        F.size("__t").cast("long").alias("n_tokens"),
    )
    sharded = assign_shards(scrubbed, id_col, n_shards=n_shards, salt=salt)
    return pack_by_token_budget(
        sharded, id_col, "n_tokens", budget, partition_cols=["shard"]
    )
