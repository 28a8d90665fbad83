"""Streaming corpus ingestion (streaming/corpus_ingest.py): real
file-source stream with availableNow, batch-equivalence, cross-batch
dedup, and replay idempotence."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
    ingest_corpus_batch,
    run_corpus_ingest_stream,
)

ROWS = [
    # (doc_id, text) — texts engineered so some repeat across drops
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    (4, "sphinx of black quartz judge my vow"),
    (5, "how vexingly quick daft zebras jump"),
    (6, "pack my box with five dozen liquor jugs"),      # dup of 2
    (7, "jived fox nymph grabs quick waltz"),
    (8, "the five boxing wizards jump quickly"),
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write_drops(spark, src_dir):
    os.makedirs(src_dir, exist_ok=True)
    half = len(ROWS) // 2
    for d, chunk in enumerate((ROWS[:half], ROWS[half:])):
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(
            f"{src_dir}/_stage{d}"
        )
        part = next(
            f
            for f in os.listdir(f"{src_dir}/_stage{d}")
            if f.endswith(".parquet")
        )
        os.rename(
            f"{src_dir}/_stage{d}/{part}", f"{src_dir}/drop{d}.parquet"
        )


def _expected_ids(spark):
    """Batch-computed expectation: quality keepers, lowest doc_id per
    text."""
    docs = _docs(spark, ROWS)
    keep = {
        r["doc_id"]
        for r in hashed_linear_score(
            docs, synthetic_weights(spark, 4096), num_buckets=4096
        ).collect()
        if r["keep"]
    }
    first_by_text = {}
    for i, t in ROWS:
        if i in keep and (t not in first_by_text or i < first_by_text[t]):
            first_by_text[t] = i
    return set(first_by_text.values())


def test_stream_ingest_matches_batch_and_dedups_across_drops(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    target = str(tmp_path / "corpus")
    _write_drops(spark, src)
    run_corpus_ingest_stream(
        spark, src, target, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(target)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert ids == _expected_ids(spark)
    # corpus texts are unique and the ledger column exists
    n = got.count()
    assert got.select("text_md5").distinct().count() == n
    assert got.filter(F.md5("text") != F.col("text_md5")).count() == 0


def test_replayed_batch_appends_nothing(spark, tmp_path):
    """At-least-once replay safety: re-ingesting the same batch adds
    zero rows — its texts are already in the ledger."""
    target = str(tmp_path / "corpus")
    batch = _docs(spark, ROWS[:4])
    ingest_corpus_batch(batch, target)
    before = spark.read.parquet(target).count()
    assert before > 0
    ingest_corpus_batch(batch, target)  # crash-replay of the same batch
    assert spark.read.parquet(target).count() == before


B1 = ROWS[:4]
B2 = ROWS[4:]


def test_exact_probe_prunes_bucketed_corpus_and_never_moves_it(
    spark, tmp_path
):
    """Round-8 corpus layout pin (the ledger recipe applied to the
    exact-dedup path): with a bucketed corpus, a batch's md5 membership
    probe must show (a) PartitionFilters pruning on mb at the corpus
    FileScan, (b) a text_md5-only ReadSchema, (c) the corpus streamed
    in place through a LeftSemi BuildRight probe — no Exchange/Sort
    between the scan and the join. The pre-round-8 direction broadcast
    the whole O(corpus) md5 column per micro-batch."""
    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        _exact_dedup_stage,
        ingest_corpus_batch,
    )

    target = str(tmp_path / "corpus")
    ingest_corpus_batch(_docs(spark, B1), target)
    assert "mb" in spark.read.parquet(target).columns
    # same batch again: every text collides -> plan carries the probe
    out = _exact_dedup_stage(_docs(spark, B1), target, 4096, 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [mb" in plan, plan
    assert "ReadSchema: struct<text_md5:string>" in plan, plan
    lines = plan.splitlines()
    (scan_i,) = [i for i, ln in enumerate(lines) if "FileScan" in ln]

    def depth(ln):
        for m in ("+- ", ":- "):
            if m in ln:
                return ln.index(m)
        return -1

    d = depth(lines[scan_i])
    for i in range(scan_i - 1, -1, -1):
        di = depth(lines[i])
        if di < 0 or di >= d:
            continue
        d = di
        if "Join" in lines[i]:
            assert "LeftSemi, BuildRight" in lines[i], lines[i]
            break
        assert "Exchange" not in lines[i] and "Sort" not in lines[i], lines[i]
    # and the collision actually holds: everything deduped away
    assert out.count() == 0


def test_corpus_compaction_and_legacy_layout(spark, tmp_path):
    """compact_corpus_path rewrites one file per bucket without
    changing corpus contents; a legacy FLAT corpus keeps its layout on
    append until compaction migrates it."""
    import glob
    import os

    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        compact_corpus_path,
        ingest_corpus_batch,
    )

    # legacy flat corpus: seed without mb
    target = str(tmp_path / "corpus")
    ingest_corpus_batch(_docs(spark, B1), str(tmp_path / "seed"))
    spark.read.parquet(str(tmp_path / "seed")).drop("mb").write.parquet(
        target
    )
    ingest_corpus_batch(_docs(spark, B2), target)
    assert "mb" not in spark.read.parquet(target).columns
    assert not any(d.startswith("mb=") for d in os.listdir(target))
    before = {
        tuple(r)
        for r in spark.read.parquet(target)
        .select("doc_id", "text_md5")
        .collect()
    }
    compact_corpus_path(spark, target)
    after_df = spark.read.parquet(target)
    assert "mb" in after_df.columns  # migrated
    assert {
        tuple(r) for r in after_df.select("doc_id", "text_md5").collect()
    } == before
    for d in glob.glob(f"{target}/mb=*"):
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d
    # post-migration appends land bucketed
    ingest_corpus_batch(
        _docs(spark, [(99, "a wholly new document about zebras today")]),
        target,
    )
    assert 99 in {
        r["doc_id"] for r in spark.read.parquet(target).collect()
    }


def test_stream_file_compaction_cadence(spark, tmp_path):
    """compact_files_every=2: after a 4-tranche availableNow drain the
    band ledger and corpus sit at one file per bucket, and the stream's
    results equal an uncompacted run's."""
    import glob
    import os

    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        run_neardup_ingest_stream,
    )

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    batches = [B1, B2,
               [(17, "completely fresh text about mountains and rivers")],
               [(18, "another new document regarding oceans and tides")]]
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"_st{i}")
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(f"{stage}/{part}", f"{src}/b{i}.parquet")

    t1, b1c, ck1 = (str(tmp_path / p) for p in ("c1", "l1", "k1"))
    run_neardup_ingest_stream(
        spark, src, t1, b1c, ck1, compact_files_every=2
    )
    t2, b2c, ck2 = (str(tmp_path / p) for p in ("c2", "l2", "k2"))
    run_neardup_ingest_stream(spark, src, t2, b2c, ck2)

    got1 = {r["doc_id"] for r in spark.read.parquet(t1).collect()}
    got2 = {r["doc_id"] for r in spark.read.parquet(t2).collect()}
    assert got1 == got2
    led1 = {
        tuple(r)
        for r in spark.read.parquet(b1c).select("doc_id", "band", "sig").collect()
    }
    led2 = {
        tuple(r)
        for r in spark.read.parquet(b2c).select("doc_id", "band", "sig").collect()
    }
    assert led1 == led2
    # compacted stores: one file per bucket dir
    for store, pref in ((b1c, "sb="), (t1, "mb=")):
        for d in glob.glob(f"{store}/{pref}*"):
            assert len(glob.glob(f"{d}/*.parquet")) == 1, d
