"""Asymmetric containment join (`operators/containment.py`): direction
semantics (contained side is id_a), exact-threshold retention under
integer arithmetic, recall vs a brute-force reference, and the
max_posting_df cap's documented recall trade."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from data_integration_openfoodfacts_spark.operators.containment import (
    containment_pairs,
)
from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
    word_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): (r["common"], r["size_a"], r["size_b"])
        for r in df.collect()
    }


def _brute(spark, df, n, t_pct):
    """Reference: exhaustive shingle-set containment in plain Python."""
    sets = {
        r["doc_id"]: set(r["s"])
        for r in word_shingles(df, "doc_id", "text", n)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("s"))
        .collect()
    }
    out = {}
    for a, b in itertools.permutations(sets, 2):
        if not sets[a]:
            continue
        common = len(sets[a] & sets[b])
        if 100 * common >= t_pct * len(sets[a]):
            out[(a, b)] = (common, len(sets[a]), len(sets[b]))
    return out


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def test_subsumed_quote_found_one_direction(spark):
    """A short doc fully inside a long host: (quote, host) qualifies,
    (host, quote) does not — and the pair's Jaccard is low enough that
    the symmetric family would miss it."""
    quote = " ".join(WORDS[:5])
    host = " ".join(WORDS[:5] + ["x%d" % i for i in range(40)])
    df = _docs(spark, [(1, quote), (2, host)])
    got = _pairs(containment_pairs(df, "doc_id", "text", 3, 100))
    assert (1, 2) in got and (2, 1) not in got
    common, sa, sb = got[(1, 2)]
    assert common == sa == 3  # all of the quote's 3 shingles
    assert common / (sa + sb - common) < 0.1  # Jaccard would miss it


def test_matches_brute_force(spark):
    """Prefix-filtered result == exhaustive reference on a mixed corpus
    (recall 1.0 with no posting cap), including mutual containment of
    near-identical docs in BOTH directions."""
    rows = [
        (1, " ".join(WORDS)),
        (2, " ".join(WORDS)),                      # identical to 1
        (3, " ".join(WORDS[:6])),                  # contained in 1/2
        (4, " ".join(WORDS[3:]) + " extra tail"),  # partial overlap
        (5, "unrelated words only here today"),
        (6, "tiny"),                               # no shingles (len<3)
    ]
    df = _docs(spark, rows)
    for t in (60, 90, 100):
        got = _pairs(containment_pairs(df, "doc_id", "text", 3, t))
        assert got == _brute(spark, df, 3, t), f"t={t}"
    mutual = _pairs(containment_pairs(df, "doc_id", "text", 3, 100))
    assert (1, 2) in mutual and (2, 1) in mutual


def test_exact_threshold_boundary_is_kept(spark):
    """containment == t exactly must be retained: 100*common >= t*size
    is exact integer arithmetic, so there is no IEEE ceil to lose it.
    Doc 1 has 10 shingles, exactly 9 shared -> kept at 90, not at 91."""
    base = ["w%d" % i for i in range(12)]          # 10 shingles
    other = base[:11] + ["DIFFERENT"]              # shares 9 of them
    df = _docs(spark, [(1, " ".join(base)), (2, " ".join(other) )])
    got90 = _pairs(containment_pairs(df, "doc_id", "text", 3, 90))
    assert got90[(1, 2)][0] == 9 and got90[(1, 2)][1] == 10
    got91 = _pairs(containment_pairs(df, "doc_id", "text", 3, 91))
    assert (1, 2) not in got91


def test_posting_cap_trades_recall_for_bounded_work(spark):
    """With max_posting_df below a hot shingle's df, pairs whose only
    shared prefix shingles are that hot disappear (the documented
    bounded-work trade); with the cap above every df, the result is
    unchanged."""
    rows = [(i, " ".join(WORDS[:5])) for i in range(1, 6)]
    df = _docs(spark, rows)
    full = _pairs(containment_pairs(df, "doc_id", "text", 3, 100))
    assert len(full) == 20  # 5 identical docs, all ordered pairs
    capped = _pairs(
        containment_pairs(
            df, "doc_id", "text", 3, 100, max_posting_df=2
        )
    )
    assert capped == {}
    uncapped = _pairs(
        containment_pairs(
            df, "doc_id", "text", 3, 100, max_posting_df=50
        )
    )
    assert uncapped == full
