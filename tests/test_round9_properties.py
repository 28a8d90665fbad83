"""Hypothesis property tests for the round-9 changes, each checked
against an independent pure-Python reference on arbitrary inputs: the
span-exact substring removal (cut set == interval union of duplicated
windows, reassembly correctness), the hashed-logistic trainer's exact
integer trajectory, and the shared bucketed-ledger bucket function.
Spark calls are batched per example (driver-side data, few jobs per
property check)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="ab", min_size=1, max_size=2)
_doc = st.lists(_word, min_size=0, max_size=16).map(" ".join)
W = 4  # small window so random tiny docs actually collide


def _ref_spans(texts: list[str], w: int = W):
    """Pure-Python reference: per doc, the union of [i, i+w-1] spans
    of windows whose text occurs in >= 2 distinct documents; returns
    (removed_positions, clean_text) per doc (1-based positions)."""
    toks = [t.split(" ") if t else [] for t in texts]
    toks = [[x for x in ts if x] for ts in toks]
    owners: dict[str, set[int]] = {}
    for d, ts in enumerate(toks):
        for i in range(len(ts) - w + 1):
            owners.setdefault(" ".join(ts[i : i + w]), set()).add(d)
    out = []
    for d, ts in enumerate(toks):
        cut: set[int] = set()
        for i in range(len(ts) - w + 1):
            if len(owners[" ".join(ts[i : i + w])]) >= 2:
                cut.update(range(i + 1, i + w + 1))
        clean = " ".join(
            tok for j, tok in enumerate(ts, start=1) if j not in cut
        )
        out.append((len(ts), len(cut), clean))
    return out


@given(st.lists(_doc, min_size=1, max_size=8))
@_settings
def test_span_removal_matches_reference(spark, texts):
    """remove_duplicate_spans == the brute-force positional union on
    arbitrary corpora, including the n_tokens/removed/clean columns."""
    from data_integration_openfoodfacts_spark.operators.substring_dedup import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["removed_tokens"], r["clean_text"]
        )
        for r in remove_duplicate_spans(docs, window=W).collect()
    }
    want = dict(enumerate(_ref_spans(texts)))
    assert got == want


@given(st.lists(_doc, min_size=1, max_size=8))
@_settings
def test_span_removal_cut_equals_window_stats_coverage(spark, texts):
    """Counted-there == cut-here on arbitrary corpora:
    duplicate_window_stats.dup_tokens equals
    remove_duplicate_spans.removed_tokens per document."""
    from data_integration_openfoodfacts_spark.operators.substring_dedup import (
        duplicate_window_stats,
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    stats = {
        r["doc_id"]: r["dup_tokens"]
        for r in duplicate_window_stats(docs, window=W).collect()
    }
    cuts = {
        r["doc_id"]: r["removed_tokens"]
        for r in remove_duplicate_spans(docs, window=W).collect()
    }
    assert stats == cuts


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_train(rows, num_buckets, n_iters, lr_inv):
    """Pure-Python replay of the integer GD trajectory (the same
    arithmetic the DuckDB oracle unrolls)."""
    feats: dict[int, dict[int, int]] = {}
    ys: dict[int, int] = {}
    for doc_id, text, y in rows:
        ys[doc_id] = y
        f = feats.setdefault(doc_id, {})
        for tok in text.split(" "):
            b = _md5_long(tok) % num_buckets
            f[b] = f.get(b, 0) + 1
    w = {
        b: _md5_long(f"qtrain{b}") % 2001 - 1000
        for b in range(num_buckets)
    }
    n_docs = len(feats)
    if n_docs == 0:
        return w
    for _ in range(n_iters):
        g = {b: 0 for b in range(num_buckets)}
        for d, f in feats.items():
            n_tok = sum(f.values())
            m = math.floor(sum(w[b] * x for b, x in f.items()) / n_tok)
            p = min(1_000_000, max(0, 500_000 + math.floor(m / 4)))
            e = ys[d] * 1_000_000 - p
            for b, x in f.items():
                g[b] += e * x
        w = {
            b: max(
                -1_000_000,
                min(1_000_000, wv + math.floor(g[b] / (n_docs * lr_inv))),
            )
            for b, wv in w.items()
        }
    return w


@given(
    st.lists(
        st.tuples(
            st.lists(_word, min_size=1, max_size=6).map(" ".join),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=6,
    )
)
@_settings
def test_trainer_matches_integer_reference(spark, labeled):
    """train_hashed_logistic replays the exact integer trajectory of
    the pure-Python reference on arbitrary labeled corpora — the same
    property the DuckDB oracle gate relies on, checked against a
    THIRD independent implementation."""
    from data_integration_openfoodfacts_spark.operators.training import (
        train_hashed_logistic,
    )

    rows = [(i, t, y) for i, (t, y) in enumerate(labeled)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, y long"
    )
    got = {
        r["bucket"]: r["w_micro"]
        for r in train_hashed_logistic(
            docs, num_buckets=16, n_iters=2, lr_inv=4
        ).collect()
    }
    assert got == _ref_train(rows, 16, 2, 4)


@given(st.lists(st.text(alphabet="0123456789abcdef", min_size=32,
                        max_size=32), min_size=1, max_size=8),
       st.sampled_from([4, 16, 64, 256]))
@_settings
def test_bucket_function_matches_python_md5(spark, keys, n_buckets):
    """kb_of (the shared layout's bucket id) == Python's md5 60-bit
    prefix mod B for arbitrary hex keys and every supported B."""
    from pyspark.sql import functions as F

    from data_integration_openfoodfacts_spark.operators.novelty_ledger import (
        kb_of,
    )

    df = spark.createDataFrame([(k,) for k in keys], "shingle_md5 string")
    got = {
        r["shingle_md5"]: r["kb"]
        for r in df.select(
            "shingle_md5", kb_of("shingle_md5", n_buckets).alias("kb")
        ).collect()
    }
    want = {k: int(k[:15], 16) % n_buckets for k in keys}
    assert got == want
