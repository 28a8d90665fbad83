"""Takedown-request stream (`streaming/retraction_stream.py`):
stream==batch equivalence, whole-stream replay no-op, audit-row
first-writer-wins, per-owner vs per-key semantics across the two
takedown surfaces, and fresh-checkpoint at-least-once safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.bloom import (
    bloom_probe_keys,
    counting_to_words,
)
from data_integration_openfoodfacts_spark.operators.novelty import seen_keys
from data_integration_openfoodfacts_spark.operators.novelty_ledger import (
    append_ledger_delta,
    read_ledger,
)
from data_integration_openfoodfacts_spark.streaming.counting_store import (
    read_counts,
    store_versions,
    write_counting_delta,
)
from data_integration_openfoodfacts_spark.streaming.retraction_stream import (
    run_takedown_stream,
    takedown_batch,
)

NW, K = 64, 3
NB = 8

# (doc_id, text): 'shared' has a surviving owner (2) after doc 1 is
# taken down; 'solo' loses its only owner; 'kept' is never requested.
ROWS = [
    (1, "shared"),
    (2, "shared"),
    (3, "solo"),
    (4, "kept"),
]


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _seed(spark, tmp_path):
    store = str(tmp_path / "store")
    ledger = str(tmp_path / "ledger")
    docs = _docs(spark, ROWS)
    write_counting_delta(
        docs.select(F.md5("text").alias("text_md5")),
        "text_md5", store, "seed", NW, K,
    )
    append_ledger_delta(
        docs.groupBy(F.md5("text").alias("shingle_md5")).agg(
            F.min("doc_id").alias("first_doc")
        ),
        ledger, n_buckets=NB,
    )
    return docs, store, ledger


def _write_queue(spark, tmp_path, batches):
    """One parquet file per request batch, flat in one directory."""
    reqs = str(tmp_path / "reqs")
    os.makedirs(reqs)
    for i, rows in enumerate(batches):
        part = str(tmp_path / f"part{i}")
        _docs(spark, rows).coalesce(1).write.parquet(part)
        src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        os.link(os.path.join(part, src),
                os.path.join(reqs, f"part-{i}.parquet"))
    return reqs


def _verdicts(spark, docs, store, ledger, texts=None):
    texts = texts if texts is not None else {r[1] for r in ROWS}
    keys = docs.select(F.md5("text").alias("text_md5")).distinct()
    flags = {
        r["text_md5"]: r["maybe_member"]
        for r in bloom_probe_keys(
            keys, "text_md5",
            counting_to_words(read_counts(spark, store)), NW, K,
        ).collect()
    }
    exact = {
        r["shingle_md5"]
        for r in seen_keys(
            keys.select(F.col("text_md5").alias("shingle_md5")),
            read_ledger(spark, ledger),
        ).collect()
    }
    import hashlib

    def h(t):
        return hashlib.md5(t.encode()).hexdigest()

    return (
        {t: flags[h(t)] for t in texts},
        {t: h(t) in exact for t in texts},
    )


def test_owner_vs_key_semantics(spark, tmp_path):
    """One batch takes down docs 1 (shared text) and 3 (solo text):
    the counting screen keeps 'shared' (owner 2 survives) and drops
    'solo'; the exact ledger drops BOTH requested keys — per-key, not
    per-owner."""
    docs, store, ledger = _seed(spark, tmp_path)
    takedown_batch(
        _docs(spark, [ROWS[0], ROWS[2]]),
        store, str(tmp_path / "res"), 0, NW, K, ledger_path=ledger,
    )
    counting, exact = _verdicts(spark, docs, store, ledger)
    assert counting == {"shared": True, "solo": False, "kept": True}
    assert exact == {"shared": False, "solo": False, "kept": True}


def test_stream_matches_batch_and_replay_is_noop(spark, tmp_path):
    docs, store, ledger = _seed(spark, tmp_path)
    reqs = _write_queue(
        spark, tmp_path, [[ROWS[0]], [ROWS[2]]]
    )
    res, ckpt = str(tmp_path / "res"), str(tmp_path / "ckpt")
    run_takedown_stream(
        spark, reqs, store, res, ckpt,
        max_files_per_trigger=1, n_words=NW, k=K, ledger_path=ledger,
    )
    counting, exact = _verdicts(spark, docs, store, ledger)
    assert counting == {"shared": True, "solo": False, "kept": True}
    assert exact == {"shared": False, "solo": False, "kept": True}
    # audit rows: one per trigger, totals of the REQUEST batch
    audits = {
        r["batch_id"]: (r["n_requests"], r["n_keys"])
        for r in spark.read.parquet(res).collect()
    }
    assert audits == {0: (1, 1), 1: (1, 1)}
    v1 = store_versions(spark, store)
    n1 = read_ledger(spark, ledger).count()
    # same checkpoint: no new files -> no triggers -> no-op
    run_takedown_stream(
        spark, reqs, store, res, ckpt,
        max_files_per_trigger=1, n_words=NW, k=K, ledger_path=ledger,
    )
    assert store_versions(spark, store) == v1
    assert read_ledger(spark, ledger).count() == n1


def test_fresh_checkpoint_replay_is_safe(spark, tmp_path):
    """At-least-once delivery: replaying the WHOLE queue from a fresh
    checkpoint re-offers every batch; the counting deltas refuse by
    directory, the ledger anti-joins already-gone keys — final state
    identical, no double subtraction."""
    docs, store, ledger = _seed(spark, tmp_path)
    reqs = _write_queue(spark, tmp_path, [[ROWS[0]], [ROWS[2]]])
    res = str(tmp_path / "res")
    for i in range(2):  # two full drains, independent checkpoints
        run_takedown_stream(
            spark, reqs, store, res, str(tmp_path / f"ckpt{i}"),
            max_files_per_trigger=1, n_words=NW, k=K,
            ledger_path=ledger,
        )
    counting, exact = _verdicts(spark, docs, store, ledger)
    assert counting == {"shared": True, "solo": False, "kept": True}
    assert exact == {"shared": False, "solo": False, "kept": True}
    # no negative position rows: nothing was subtracted twice
    assert read_counts(spark, store).filter("cnt < 0").count() == 0


def test_per_request_idempotence_with_applied_ledger(spark, tmp_path):
    """applied_path on: a request id retracts at most once EVER —
    across duplicate files, within-batch duplicates, and re-batched
    fresh-checkpoint replays — because the batch anti-joins the
    applied-requests ledger before touching either store."""
    rows = ROWS + [(5, "extra")]
    docs = _docs(spark, rows)
    store = str(tmp_path / "store")
    ledger = str(tmp_path / "ledger")
    applied = str(tmp_path / "applied")
    write_counting_delta(
        docs.select(F.md5("text").alias("text_md5")),
        "text_md5", store, "seed", NW, K,
    )
    append_ledger_delta(
        docs.groupBy(F.md5("text").alias("shingle_md5")).agg(
            F.min("doc_id").alias("first_doc")
        ),
        ledger, n_buckets=NB,
    )
    # queue: doc 1 delivered TWICE (own file + repeated in file 1,
    # where it also appears doubled within the batch), doc 3 once
    reqs = _write_queue(
        spark, tmp_path,
        [[ROWS[0]], [ROWS[0], ROWS[0], ROWS[2]]],
    )
    res = str(tmp_path / "res")
    run_takedown_stream(
        spark, reqs, store, res, str(tmp_path / "ckptA"),
        max_files_per_trigger=1, n_words=NW, k=K,
        ledger_path=ledger, applied_path=applied,
    )
    counting, exact = _verdicts(spark, docs, store, ledger)
    assert counting["shared"] and not counting["solo"]
    assert not exact["shared"] and not exact["solo"] and exact["kept"]
    # doc 1's occurrence subtracted exactly ONCE: no negative rows
    assert read_counts(spark, store).filter("cnt < 0").count() == 0
    # audit: batch 1's fresh subset is just doc 3
    audits = {
        r["batch_id"]: r["n_requests"]
        for r in spark.read.parquet(res).collect()
    }
    assert audits == {0: 1, 1: 1}
    # re-batched redelivery + one genuinely new request (doc 5)
    part = str(tmp_path / "late")
    _docs(spark, [ROWS[2], (5, "extra")]).coalesce(1).write.parquet(part)
    src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    os.link(os.path.join(part, src), os.path.join(reqs, "part-9.parquet"))
    run_takedown_stream(
        spark, reqs, store, res, str(tmp_path / "ckptB"),
        max_files_per_trigger=1, n_words=NW, k=K,
        ledger_path=ledger, applied_path=applied,
    )
    counting, _exact = _verdicts(
        spark, docs, store, ledger,
        texts={r[1] for r in ROWS} | {"extra"},
    )
    assert not counting["extra"]  # doc 5 applied
    assert read_counts(spark, store).filter("cnt < 0").count() == 0
    # applied ledger holds exactly the three distinct request ids
    assert spark.read.parquet(applied).select(
        "request_md5"
    ).distinct().count() == 3
    assert spark.read.parquet(applied).count() == 3


def test_grown_queue_fresh_checkpoint_applies_only_new(spark, tmp_path):
    """The content-keyed delta ids' payoff: drain a 1-file queue, add
    a second request file, re-drain the WHOLE queue from a fresh
    checkpoint — the already-applied file is refused by content digest
    (positional ids would have under-retracted here), the new file
    applies once, and nothing is double-subtracted."""
    docs, store, ledger = _seed(spark, tmp_path)
    reqs = _write_queue(spark, tmp_path, [[ROWS[0]]])
    res = str(tmp_path / "res")
    run_takedown_stream(
        spark, reqs, store, res, str(tmp_path / "ckptA"),
        max_files_per_trigger=1, n_words=NW, k=K, ledger_path=ledger,
    )
    # queue grows: doc 3's takedown lands as a second file
    part = str(tmp_path / "late")
    _docs(spark, [ROWS[2]]).coalesce(1).write.parquet(part)
    src = next(f for f in os.listdir(part) if f.endswith(".parquet"))
    os.link(os.path.join(part, src), os.path.join(reqs, "part-9.parquet"))
    run_takedown_stream(
        spark, reqs, store, res, str(tmp_path / "ckptB"),
        max_files_per_trigger=1, n_words=NW, k=K, ledger_path=ledger,
    )
    counting, exact = _verdicts(spark, docs, store, ledger)
    assert counting == {"shared": True, "solo": False, "kept": True}
    assert exact == {"shared": False, "solo": False, "kept": True}
    assert read_counts(spark, store).filter("cnt < 0").count() == 0
    # exactly three deltas exist: seed + the two distinct batches
    assert store_versions(spark, store)["latest"] == 3
