"""Distributed BPE merge learning (operators/bpe.py) — hand-computed
merge sequences; the cross-engine replay is pinned by q137's unrolled
DuckDB oracle."""

from __future__ import annotations

from data_integration_openfoodfacts_spark.operators.bpe import (
    learn_bpe_merges,
    word_freq_table,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_textbook_sequence(spark):
    # words: aaab x2, ab x1
    # r1: (a,a)=4 > (a,b)=3           -> merge a+a    (aaab -> aa,a,b)
    # r2: (a,b)=3 > (aa,a)=2          -> merge a+b    (-> aa,ab / ab)
    # r3: (aa,ab)=2                    -> merge aa+ab
    docs = _docs(spark, ["aaab aaab ab"])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(docs, n_merges=3).collect()
    ]
    assert got == [(1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2)]


def test_bpe_tiebreak_is_pair_string_asc(spark):
    # (x,y) and (y,x) both count 1 -> lexicographically smaller pair
    # key wins deterministically
    docs = _docs(spark, ["xy yx"])
    first = learn_bpe_merges(docs, n_merges=1).collect()[0]
    assert (first["left"], first["right"]) == ("x", "y")


def test_bpe_stops_when_no_pairs_remain(spark):
    # single-char words only: zero mergeable pairs -> empty merge table
    docs = _docs(spark, ["a b c a"])
    assert learn_bpe_merges(docs, n_merges=5).count() == 0


def test_bpe_word_freq_weighting(spark):
    # frequency weighting: 'zz' appearing 3x beats 'qqqq' appearing
    # once ((z,z)=3 vs (q,q)=3 -> tiebreak 'q'<'z' picks (q,q)); make
    # counts unambiguous instead: zz x4 -> (z,z)=4 > (q,q)=3
    docs = _docs(spark, ["zz zz", "zz zz qqqq"])
    first = learn_bpe_merges(docs, n_merges=1).collect()[0]
    assert (first["left"], first["right"], first["pair_count"]) == (
        "z", "z", 4,
    )
    wf = {r["word"]: r["cnt"] for r in word_freq_table(docs).collect()}
    assert wf == {"zz": 4, "qqqq": 1}


def test_bpe_apply_encodes_with_rank_ordered_merges(spark):
    from data_integration_openfoodfacts_spark.operators.bpe import (
        apply_bpe_merges,
    )

    docs = _docs(spark, ["aaab ab"])
    out = apply_bpe_merges(docs, [("a", "a"), ("a", "b")]).collect()
    assert list(out[0]["tokens"]) == ["aa", "ab", "ab"]


def test_bpe_apply_drops_empty_words_keeps_unknowns(spark):
    from data_integration_openfoodfacts_spark.operators.bpe import (
        apply_bpe_merges,
    )

    # double space -> empty word filtered; chars not covered by any
    # merge stay as single-char symbols
    docs = _docs(spark, ["ab  xyz"])
    out = apply_bpe_merges(docs, [("a", "b")]).collect()
    assert list(out[0]["tokens"]) == ["ab", "x", "y", "z"]


def test_bpe_merge_cannot_cross_symbol_boundaries(spark):
    """Wrapped-symbol regression (review finding): after merge (a,b),
    the word 'xabc' is [x, ab, c]; merge (b,c) must NOT match the
    suffix 'b' of symbol 'ab' followed by 'c' — a bare-separator
    replace scheme does exactly that and corrupts both the merge table
    and the encoding."""
    from data_integration_openfoodfacts_spark.operators.bpe import (
        apply_bpe_merges,
    )

    docs = _docs(spark, ["ab ab ab bc bc xabc"])
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(docs, n_merges=3).collect()
    ]
    # r1 (a,b)=4; r2 (b,c)=2 (bc words only — [x,ab,c] has no (b,c)
    # adjacency); r3 tie (x,ab)=1 vs (ab,c)=1 -> pair-string asc
    assert got == [(1, "a", "b", 4), (2, "b", "c", 2), (3, "ab", "c", 1)]
    enc = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe_merges(
            docs, [(l, r_) for _, l, r_, _ in got]
        ).collect()
    }
    assert enc[0] == ["ab", "ab", "ab", "bc", "bc", "x", "abc"]


def test_bpe_reserved_control_chars_stripped(spark):
    """Corpus text containing the scheme's reserved control chars
    (\\x1d, \\x1e, \\x1f) must not corrupt the wrapped-symbol encoding
    or crash the driver-side pair split (round-5 advisor finding) —
    they are translated out before any symbol work, both here and in
    the q137/q138 oracle twins."""
    from data_integration_openfoodfacts_spark.operators.bpe import (
        apply_bpe_merges,
    )

    dirty = _docs(spark, ["aa\x1eab a\x1da\x1fab ab"])
    clean = _docs(spark, ["aaab aaab ab"])
    got_d = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(dirty, n_merges=3).collect()
    ]
    got_c = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in learn_bpe_merges(clean, n_merges=3).collect()
    ]
    assert got_d == got_c == [
        (1, "a", "a", 4), (2, "a", "b", 3), (3, "aa", "ab", 2),
    ]
    enc_d = apply_bpe_merges(dirty, [("a", "a"), ("a", "b")]).collect()
    enc_c = apply_bpe_merges(clean, [("a", "a"), ("a", "b")]).collect()
    assert [r["tokens"] for r in enc_d] == [r["tokens"] for r in enc_c]
