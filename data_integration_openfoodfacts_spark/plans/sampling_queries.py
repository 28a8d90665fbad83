"""Deterministic sampling / sharding / repetition-signal queries
(training-data pipeline surface, beyond the reference's own scope per
the build brief — the reference notebook processes its full 418k
extract with no sampling stage).

Engine-parity invariants (same as llm_queries.py): all hash decisions
are md5-derived via ``operators.similarity_dedup.md5_long`` whose
DuckDB twin is ``CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT)``;
ratios are single IEEE divisions of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_analysis import (
    bigram_array,
    distinct_element_ratio,
    top_element_count,
    ws_tokens,
)
from ..operators.sampling import (
    assign_shards,
    deterministic_sample,
    stratified_sample_exact,
)
from ..sources.parquet_source import load_table

# DuckDB twin of operators.sampling.sample_bucket (salt = '').
_BUCKET = (
    "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) % 1000000"
)
# DuckDB twin of the raw md5_long value (shard assignment).
_MD5_LONG = (
    "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT)"
)


def q59_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% Bernoulli sample of documents by hashed doc_id
    (operators/sampling.py::deterministic_sample): re-run-stable,
    partition-layout independent, zero-shuffle. The selected id set is
    the contract — it must survive repartitioning and engine swaps."""
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", rate=0.10).select(
        "doc_id", "source", "lang"
    )


Q59_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_BUCKET} < 100000
"""


def q60_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per source stratum, chosen by hash order
    (deterministic reservoir equivalent). One shuffle on ``source``;
    the (hash, id) sort key is unique so the pick is total-order
    stable."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample_exact(
        docs, ["source"], "doc_id", k=20
    ).select("doc_id", "source")


Q60_ORACLE = f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY {_BUCKET}, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 20
"""


def q61_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct
    token ratio, top-token fraction, top-bigram fraction — all pure
    per-row expressions (functions/text_analysis.py), zero shuffle, so
    at 100 TB this is scan-bound."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token/bigram arrays as projected attributes so the
    # nested higher-order counters reference them cheaply (see
    # functions/text_analysis.py::ws_tokens on why inlining is O(n^3)).
    arrs = docs.select(
        "doc_id",
        ws_tokens("text").alias("t"),
    ).withColumn("bg", bigram_array(F.col("t")))
    t, bg = F.col("t"), F.col("bg")
    return arrs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        distinct_element_ratio(t).alias("distinct_ratio"),
        (top_element_count(t) / F.size(t)).alias("top_token_frac"),
        top_element_count(bg).alias("top_bigram_count"),
    )


Q61_ORACLE = """
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
       CAST(list_max(list_transform(list_distinct(t),
                w -> len(list_filter(t, x -> x = w)))) AS DOUBLE)
         / len(t) AS top_token_frac,
       CAST(list_max(list_transform(list_distinct(bg),
                w -> len(list_filter(bg, x -> x = w)))) AS BIGINT)
         AS top_bigram_count
FROM (
  SELECT doc_id, t,
         CASE WHEN len(t) >= 2 THEN
           list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
         ELSE [] END AS bg
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents)
)
"""


def q62_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a stable shard in [0,16) and report
    per-shard counts + id bounds — the balance audit a sharded
    training-data writer runs before committing an epoch layout.
    Shard assignment is per-row; the audit is one small agg."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = assign_shards(docs, "doc_id", n_shards=16)
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").alias("sum_chars"),
    )


Q62_ORACLE = f"""
SELECT CAST({_MD5_LONG} % 16 AS INTEGER) AS shard,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""


def q67_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit (functions/pii.py): the corpus is salted with
    deterministic synthetic PII (an email + SSN per doc derived from
    doc_id — the testdata itself is PII-free, so the regexes must
    actually fire to pass), then redacted; output is the scrubbed text
    fingerprint + match count per document. Pure regexp chains,
    codegen, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.pii import pii_match_count, redact_pii

    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ssn 123-45-678"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("salted"),
    )
    return salted.select(
        "doc_id",
        F.md5(redact_pii("salted")).alias("redacted_md5"),
        pii_match_count("salted").alias("n_pii"),
    )


def _q67_oracle() -> str:
    from ..functions.pii import duckdb_count_sql, duckdb_redact_sql

    salted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com ssn 123-45-678' || CAST(doc_id % 10 AS VARCHAR) || "
        "' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    )
    return f"""
SELECT doc_id,
       md5({duckdb_redact_sql(salted)}) AS redacted_md5,
       {duckdb_count_sql(salted)} AS n_pii
FROM documents
"""


def q68_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (operators/packing.py): documents
    are sharded (md5, 8 shards), then packed into 2048-token bins per
    shard by running-sum binning; output is the per-pack audit (docs,
    token total). All shards pack in parallel — the only shuffle is the
    shard hash partition."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text_analysis import ws_tokens
    from ..operators.packing import pack_by_token_budget

    with_toks = assign_shards(
        docs.select("doc_id", ws_tokens("text").alias("t")),
        "doc_id",
        n_shards=8,
    ).select("doc_id", "shard", F.size("t").cast("long").alias("n_tokens"))
    packed = pack_by_token_budget(
        with_toks, "doc_id", "n_tokens", budget=2048, partition_cols=["shard"]
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


Q68_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST({_MD5_LONG} % 8 AS INTEGER) AS shard,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, shard, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / 2048.0) AS BIGINT) AS pack_id
  FROM toks
)
SELECT shard, pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc_id
FROM packed
GROUP BY 1, 2
"""


def q71_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data pipeline, curation through packing
    (operators/curation.py): quality gate -> decontaminate -> exact
    dedup -> split (q49 stages), take the train split, then repetition
    gate -> PII scrub -> shard -> token-pack (q59-q68 stages). One
    oracle query proves the full composition; every stage is narrow or
    single-shuffle."""
    from ..operators.curation import (
        curate_training_corpus,
        prepare_training_shards,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    curated = curate_training_corpus(
        corpus, bench, "doc_id", "text"
    ).filter(F.col("split") == "train")
    train_docs = curated.select("doc_id").join(docs, "doc_id").select(
        "doc_id", "text"
    )
    out = prepare_training_shards(train_docs, "doc_id", "text")
    return out.select("doc_id", "shard", "pack_id", "n_tokens", "n_pii")


# Q49's curation CTE stack (quality gate, decontaminate, dedup, split)
# extended with the shard-prep stages. Stage thresholds mirror
# operators/curation.py defaults; the PII count embeds the full
# generated pattern chain (functions/pii.py) so the oracle mirrors
# every pattern, not just the ones the fixtures exercise.
_Q71_TEMPLATE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM toks, LATERAL (SELECT UNNEST(range(1, len(t) - 1)) AS i) u
  WHERE len(t) >= 3
),
bench AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 = 0),
corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
contaminated AS (
  SELECT c.doc_id
  FROM corp c JOIN bench b ON c.shingle = b.shingle
  GROUP BY c.doc_id
  HAVING COUNT(DISTINCT c.shingle) >= 5
),
gated AS (
  SELECT doc_id, text,
         CAST(length(text) >= 100 AS BIGINT)
         + CAST(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                / NULLIF(length(text), 0) <= 0.1 AS BIGINT)
         + CAST(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> list_contains(['the','a','of','and','to','in'], lower(x)))) AS DOUBLE)
                / NULLIF(len(string_split_regex(trim(text), '\\s+')), 0) <= 0.5 AS BIGINT)
           AS quality_score
  FROM documents WHERE doc_id % 50 <> 0
),
clean AS (
  SELECT g.doc_id, g.text
  FROM gated g
  ANTI JOIN contaminated c ON g.doc_id = c.doc_id
  WHERE g.quality_score >= 2
),
deduped AS (
  SELECT doc_id, text FROM clean
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
train AS (
  SELECT doc_id, text FROM deduped
  WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 100 < 80
),
rep_gated AS (
  SELECT doc_id, text, t FROM (
    SELECT doc_id, text,
           string_split_regex(trim(text), '\\s+') AS t
    FROM train
  )
  WHERE CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.35
),
feat AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         {pii_count} AS n_pii,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 8 AS shard
  FROM rep_gated
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
         PARTITION BY shard ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) / 2048.0) AS BIGINT) AS pack_id,
       n_tokens,
       n_pii
FROM feat
"""


def _q71_oracle() -> str:
    from ..functions.pii import duckdb_count_sql

    return _Q71_TEMPLATE.format(pii_count=duckdb_count_sql("text"))


def q101_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement: 50
    documents drawn with probability proportional to length
    (Efraimidis-Spirakis A-ES keys from md5-derived uniforms —
    ``operators/sampling.py::weighted_sample_topk``). The
    length-biased corpus subsample an LLM curation pipeline uses when
    long documents should dominate a budget.

    Scale: per-row key + global top-k (TakeOrderedAndProject);
    engine parity via identical ln((bucket+1)/1e6)/weight doubles."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.sampling import weighted_sample_topk

    return weighted_sample_topk(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", k=50
    )


Q101_ORACLE = f"""
SELECT doc_id, n_chars, sample_key
FROM (
  SELECT doc_id, n_chars,
         LN(CAST(({_BUCKET}) + 1 AS DOUBLE) / 1000000.0) / n_chars
           AS sample_key
  FROM documents
)
ORDER BY sample_key DESC, doc_id
LIMIT 50
"""


def q105_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture balancing (operators/sampling.py::
    mixture_sample): sources pool into three groups (numeric suffix
    mod 3) with target shares 50/30/20 of a 200-doc budget; each pool
    is deterministically Bernoulli-thinned to rate
    min(1, target*budget/count). The "50% web, 30% books, 20% code"
    curation step, fully reproducible (md5 draw + integer threshold)."""
    from ..operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "pool",
        F.concat(
            F.lit("pool"),
            (
                F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
                % 3
            ).cast("string"),
        ),
    )
    out = mixture_sample(
        docs,
        "pool",
        "doc_id",
        targets={"pool0": 0.5, "pool1": 0.3, "pool2": 0.2},
        budget=200,
    )
    return out.select("doc_id", "source", "pool")


Q105_ORACLE = f"""
WITH pooled AS (
  SELECT doc_id, source,
         'pool' || CAST(CAST(regexp_extract(source, '([0-9]+)', 1)
                             AS INTEGER) % 3 AS VARCHAR) AS pool
  FROM documents
),
tgt(pool, target) AS (VALUES ('pool0', 0.5), ('pool1', 0.3), ('pool2', 0.2)),
rates AS (
  SELECT p.pool,
         FLOOR(LEAST(1.0, CAST(t.target AS DOUBLE) * 200 / COUNT(*))
               * 1000000) AS threshold
  FROM pooled p JOIN tgt t ON t.pool = p.pool
  GROUP BY p.pool, t.target
)
SELECT p.doc_id, p.source, p.pool
FROM pooled p
JOIN rates r ON r.pool = p.pool
WHERE {_BUCKET.replace('doc_id', 'p.doc_id')} < r.threshold
"""


def q100_approx_distinct_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog++ distinct-count sketch with an error-bound oracle.

    The sketch itself (``approx_count_distinct``, rsd=0.02) cannot be
    reproduced by another engine, so — like q88's KMeans invariants —
    the oracle pins what a correct sketch must satisfy: per group the
    EXACT distinct count (DuckDB computes it independently) and a
    relative error within 5% (``violation = 0``; 2.5x margin over the
    configured rsd, and HLL++ is deterministic for fixed input so this
    is a stable gate, not a flaky one). Spark computes the actual
    violation flag from its sketch; a broken sketch turns the row red.

    Scale: this is THE cardinality operator at 100 TB — exact distinct
    is a full shuffle of every distinct value, the sketch is a
    fixed-size (~kB) mergeable state per group, map-side combined.
    The exact count here exists only to power the oracle check."""
    li = load_table(spark, sf_dir, "lineitem")
    per_group = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    )
    return per_group.select(
        "l_returnflag",
        "exact_distinct",
        # CASE guards the ANSI divide for an exact count of 0 (same
        # rationale as q136's violation column)
        F.when(F.col("exact_distinct") == 0, F.col("approx") != 0)
        .otherwise(
            F.abs(F.col("approx") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            > 0.05
        )
        .cast("long")
        .alias("violation"),
    )


Q100_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
       CAST(0 AS BIGINT) AS violation
FROM lineitem
GROUP BY 1
"""


def q136_hll_incremental_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental COUNT(DISTINCT) maintenance via mergeable HLL
    sketch state (`operators/matview.py::build_distinct_summary` +
    merge + finalize) — the one aggregate the algebraic summary-table
    pattern cannot carry, made maintainable by sketches.

    The events stream is split into two disjoint batches (event_id
    parity); each batch builds per-event_type sketch state, the states
    merge, and the reader view estimates distinct users. Oracle pins
    (q100-style):
      - exact_distinct per group (DuckDB recomputes independently);
      - violation = 0: merged estimate within 5% of exact (2.5x margin
        over the sketch's default precision, deterministic for fixed
        input);
      - merge_drift_violation = 0: the merged-from-batches estimate
        stays within 5%-of-exact of the single-pass whole-history
        estimate. The REGISTER merge is lossless (register-wise max),
        but DataSketches estimates a never-merged sketch with the HIP
        estimator and a merged one with the composite estimator, so
        the two ESTIMATES agree within the error bound, not
        bit-exactly (measured ~0.5% apart at sf0.1) — this bounded
        drift is what makes O(kB)-state summary tables safe to refresh
        per batch at 100 TB instead of full rebuilds.
    """
    from ..operators.matview import (
        build_distinct_summary,
        finalize_distinct_summary,
        merge_distinct_summaries,
    )
    from ..sources.parquet_source import load_events

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    keys, dcols = ["event_type"], ["user_id"]
    s_old = build_distinct_summary(
        ev.filter(F.col("event_id") % 2 == 0), keys, dcols
    )
    s_new = build_distinct_summary(
        ev.filter(F.col("event_id") % 2 == 1), keys, dcols
    )
    merged = finalize_distinct_summary(
        merge_distinct_summaries(s_old, s_new, keys, dcols), dcols
    ).select(
        "event_type",
        "n_rows",
        F.col("approx_distinct_user_id").alias("__est_merged"),
    )
    single = finalize_distinct_summary(
        build_distinct_summary(ev, keys, dcols), dcols
    ).select(
        "event_type", F.col("approx_distinct_user_id").alias("__est_single")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        exact.join(merged, "event_type")
        .join(single, "event_type")
        .select(
            "event_type",
            "n_rows",
            "exact_distinct",
            # CASE guards the ANSI divide: an all-NULL-user group has
            # exact_distinct 0, where "violation" means a nonzero
            # estimate (lazy CaseWhen branches — no DIVIDE_BY_ZERO)
            F.when(
                F.col("exact_distinct") == 0, F.col("__est_merged") != 0
            )
            .otherwise(
                F.abs(F.col("__est_merged") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                > 0.05
            )
            .cast("long")
            .alias("violation"),
            F.when(
                F.col("exact_distinct") == 0,
                F.col("__est_merged") != F.col("__est_single"),
            )
            .otherwise(
                F.abs(F.col("__est_merged") - F.col("__est_single"))
                / F.col("exact_distinct")
                > 0.05
            )
            .cast("long")
            .alias("merge_drift_violation"),
        )
    )


Q136_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       CAST(0 AS BIGINT) AS violation,
       CAST(0 AS BIGINT) AS merge_drift_violation
FROM events
GROUP BY 1
"""


def q141_histogram_incremental_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental QUANTILE maintenance via mergeable fixed-bin
    histogram state (`operators/matview.py::build_histogram_summary`
    + merge + `histogram_quantile_bounds`) — the lossless counterpart
    to q136's HLL distinct sketch: histogram registers are plain
    counts, so merged-from-batches state is BIT-IDENTICAL to
    single-pass state (merge_mismatch pinned to exactly 0, no drift
    bound needed), and quantile reads come back as [lo, hi) bin
    bounds at O(n_bins) state per group.

    The events stream splits into two disjoint batches (event_id
    parity); each builds per-event_type bin counts (width 10, 50
    bins); states merge; p50/p90/p99 bounds read from the merged
    state with ranks in EXACT integer arithmetic
    (ceil(num*n/den) = (num*n+den-1) DIV den — never a float q*n).
    Oracle recomputes the histogram single-pass in DuckDB, the same
    integer ranks, AND the exact rank-th value independently
    (row_number over the sorted values), then both engines evaluate
    the same in-bounds check — `violation` must be 0 from real
    arithmetic on both sides, not a pinned literal.

    Scale: exact percentiles at 100 TB need a full sort or a
    multi-pass select; this summary answers any quantile to
    bin-width resolution from kB-sized mergeable state refreshed in
    O(|batch|). The exact rank-th value here exists only to power
    the oracle check (q100's pattern).
    """
    from ..operators.matview import (
        build_histogram_summary,
        histogram_quantile_bounds,
        merge_histogram_summaries,
    )
    from ..sources.parquet_source import load_events

    ev = load_events(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    keys, width, n_bins = ["event_type"], 10.0, 50
    s_old = build_histogram_summary(
        ev.filter(F.col("event_id") % 2 == 0), keys, "value", width, n_bins
    )
    s_new = build_histogram_summary(
        ev.filter(F.col("event_id") % 2 == 1), keys, "value", width, n_bins
    )
    merged = merge_histogram_summaries(s_old, s_new, keys)
    single = build_histogram_summary(ev, keys, "value", width, n_bins)

    # Lossless-merge proof: per (group, bin) the merged and
    # single-pass registers must agree EXACTLY (full outer join so a
    # bin present on only one side counts as a mismatch).
    mism = (
        merged.select(
            "event_type", "__bin", F.col("__cnt").alias("__m")
        )
        .join(
            single.select(
                "event_type", "__bin", F.col("__cnt").alias("__s")
            ),
            ["event_type", "__bin"],
            "full_outer",
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                (~F.col("__m").eqNullSafe(F.col("__s"))).cast("long")
            ).alias("merge_mismatch")
        )
    )

    bounds = histogram_quantile_bounds(
        merged,
        keys,
        [("0.5", 1, 2), ("0.9", 9, 10), ("0.99", 99, 100)],
        width,
    )

    from pyspark.sql import Window

    w = Window.partitionBy("__et").orderBy("value")
    ordered = (
        ev.filter(F.col("value").isNotNull())
        .select(F.col("event_type").alias("__et"), "value")
        .withColumn("__rn", F.row_number().over(w))
    )
    return (
        bounds.join(
            ordered,
            (F.col("event_type") == F.col("__et"))
            & (F.col("__rn") == F.col("rank_idx")),
        )
        .join(mism, "event_type")
        .select(
            "event_type",
            "q_label",
            "n_total",
            "rank_idx",
            "bin_idx",
            "lo",
            "hi",
            F.col("value").cast("double").alias("exact_value"),
            F.when(
                (F.col("value") >= F.col("lo"))
                & (
                    (F.col("value") < F.col("hi"))
                    | (F.col("bin_idx") == n_bins - 1)
                ),
                0,
            )
            .otherwise(1)
            .cast("long")
            .alias("violation"),
            F.col("merge_mismatch").cast("long").alias("merge_mismatch"),
        )
    )


Q141_ORACLE = """
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 49) AS BIGINT)
           AS bin,
         COUNT(*) AS cnt
  FROM ev GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM hist
),
q(q_label, num, den) AS (
  VALUES ('0.5', 1, 2), ('0.9', 9, 10), ('0.99', 99, 100)
),
sel AS (
  SELECT c.event_type, q.q_label,
         CAST(MIN(c.total) AS BIGINT) AS n_total,
         CAST(MIN((q.num * c.total + q.den - 1) // q.den) AS BIGINT)
           AS rank_idx,
         CAST(MIN(CASE WHEN c.cum >=
                         (q.num * c.total + q.den - 1) // q.den
                       THEN c.bin END) AS BIGINT) AS bin_idx
  FROM cum c CROSS JOIN q
  GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value)
           AS rn
  FROM ev
)
SELECT s.event_type, s.q_label, s.n_total, s.rank_idx, s.bin_idx,
       CAST(s.bin_idx * 10.0 AS DOUBLE) AS lo,
       CAST((s.bin_idx + 1) * 10.0 AS DOUBLE) AS hi,
       CAST(o.value AS DOUBLE) AS exact_value,
       CAST(CASE WHEN o.value >= s.bin_idx * 10.0
                  AND (o.value < (s.bin_idx + 1) * 10.0
                       OR s.bin_idx = 49)
                 THEN 0 ELSE 1 END AS BIGINT) AS violation,
       CAST(0 AS BIGINT) AS merge_mismatch
FROM sel s
JOIN ordered o
  ON o.event_type = s.event_type AND o.rn = s.rank_idx
"""


SAMPLING_QUERIES = {
    "q59_deterministic_sample": q59_deterministic_sample,
    "q60_stratified_sample": q60_stratified_sample,
    "q61_repetition_signals": q61_repetition_signals,
    "q62_shard_balance": q62_shard_balance,
    "q67_pii_redaction": q67_pii_redaction,
    "q68_token_packing": q68_token_packing,
    "q71_training_shards": q71_training_shards,
    "q100_approx_distinct_bounds": q100_approx_distinct_bounds,
    "q101_weighted_sample": q101_weighted_sample,
    "q105_mixture_sample": q105_mixture_sample,
    "q136_hll_incremental_distinct": q136_hll_incremental_distinct,
    "q141_histogram_incremental_quantiles": (
        q141_histogram_incremental_quantiles
    ),
}

SAMPLING_ORACLES = {
    "q59_deterministic_sample": Q59_ORACLE,
    "q60_stratified_sample": Q60_ORACLE,
    "q61_repetition_signals": Q61_ORACLE,
    "q62_shard_balance": Q62_ORACLE,
    "q67_pii_redaction": _q67_oracle(),
    "q68_token_packing": Q68_ORACLE,
    "q71_training_shards": _q71_oracle(),
    "q100_approx_distinct_bounds": Q100_ORACLE,
    "q101_weighted_sample": Q101_ORACLE,
    "q105_mixture_sample": Q105_ORACLE,
    "q136_hll_incremental_distinct": Q136_ORACLE,
    "q141_histogram_incremental_quantiles": Q141_ORACLE,
}
