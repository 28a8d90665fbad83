"""Hypothesis property tests for the round-7 operators, each checked
against an independent pure-Python reference on arbitrary inputs:
rule-battery integer thresholds, token-budget greedy prefix fill,
novelty-ledger scoring, and band-ledger compaction. Spark calls are
batched per example (driver-side data, one job per property check)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_integration_openfoodfacts_spark.operators.budget_fill import (
    token_budget_fill,
)
from data_integration_openfoodfacts_spark.operators.novelty import (
    empty_ledger,
    tranche_novelty_update,
)
from data_integration_openfoodfacts_spark.operators.quality_rules import (
    rule_quality_signals,
)
from data_integration_openfoodfacts_spark.functions.text_analysis import (
    STOPWORDS,
)

_settings = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz#.", min_size=1, max_size=8
)
_doc = st.lists(_word, min_size=0, max_size=40).map(" ".join)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(st.lists(_doc, min_size=1, max_size=12))
@_settings
def test_rule_battery_matches_python_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    got = {
        r["doc_id"]: r.asDict()
        for r in rule_quality_signals(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    import re

    for i, t in rows:
        toks = re.split(r"\s+", t.strip())
        lines = t.split("\n")
        n_words = len(toks)
        sum_len = sum(len(w) for w in toks)
        n_alpha = sum(1 for w in toks if re.search("[a-zA-Z]", w))
        n_sym = len(re.findall(r"#|\.\.\.|…", t))
        n_stop = len({w.lower() for w in toks} & set(STOPWORDS))
        g = got[i]
        assert g["n_words"] == n_words, (t, g)
        assert g["sum_word_len"] == sum_len
        assert g["n_alpha_words"] == n_alpha
        assert g["n_symbols"] == n_sym
        assert g["n_stopwords"] == n_stop
        assert g["r_word_count"] == (50 <= n_words <= 100_000)
        assert g["r_mean_word_len"] == (
            3 * n_words <= sum_len <= 10 * n_words
        )
        assert g["r_symbol_ratio"] == (10 * n_sym < n_words)
        assert g["r_alpha_words"] == (5 * n_alpha >= 4 * n_words)
        assert g["n_lines"] == len(lines)


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 30)),
        min_size=1,
        max_size=15,
    ),
    st.integers(0, 60),
)
@_settings
def test_budget_fill_matches_greedy_python(spark, docs, budget):
    """Engine selection == a pure-Python greedy prefix fill using the
    same md5 draw order and integer running sum."""
    rows = [
        (i, src, "x " * n_tok if n_tok else "")
        for i, (src, n_tok) in enumerate(docs)
    ]
    budgets = spark.createDataFrame(
        [(s, budget) for s in ("a", "b", "c")],
        "source string, token_budget long",
    )
    out = token_budget_fill(
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ),
        budgets,
    ).collect()
    got = {r["doc_id"]: r["selected"] for r in out}
    # python reference: trim produces n_tok tokens ('x ' * n -> n x's),
    # empty text -> the single empty token (1)
    n_tokens = {i: (n if n else 1) for i, (_s, n) in enumerate(docs)}
    want = {}
    for s in ("a", "b", "c"):
        members = sorted(
            (i for i, (src, _n) in enumerate(docs) if src == s),
            key=lambda i: (_md5_long(f"fill:{i}"), i),
        )
        run = 0
        for i in members:
            run += n_tokens[i]
            want[i] = run <= budget
    assert got == want


@given(
    st.lists(st.lists(_doc, min_size=0, max_size=6), min_size=1, max_size=4)
)
@_settings
def test_novelty_ledger_matches_python_sets(spark, tranches):
    """Sequential tranche scoring == a pure-Python running shingle-set
    simulation (n=2 shingles to make short random docs participate)."""
    ledger = empty_ledger(spark)
    seen: set[str] = set()
    next_id = 0
    for docs in tranches:
        rows = [(next_id + j, t) for j, t in enumerate(docs)]
        next_id += len(docs)
        if not rows:
            continue
        per_doc, new = tranche_novelty_update(
            spark.createDataFrame(rows, "doc_id long, text string"),
            ledger,
            n=2,
        )
        got = {
            r["doc_id"]: (r["n_shingles"], r["n_novel"])
            for r in per_doc.collect()
        }
        # python reference
        import re

        want = {}
        firsts: dict[str, int] = {}
        for i, t in rows:
            toks = re.split(r"\s+", t.strip())
            sh = {
                " ".join(toks[k : k + 2]) for k in range(len(toks) - 1)
            } if len(toks) >= 2 else set()
            if not sh:
                continue
            novel = 0
            for g in sorted(sh):
                if g in seen or g in firsts and firsts[g] != i:
                    continue
                if g not in firsts:
                    firsts[g] = i
                    novel += 1
            want[i] = (len(sh), novel)
        assert got == want, (rows, got, want)
        seen |= set(firsts)
        ledger = ledger.unionByName(new)
