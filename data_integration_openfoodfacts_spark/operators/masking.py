"""Span-corruption preprocessing (T5 / UL2 denoising objective): mask
contiguous token spans and emit (input with sentinels, target with the
masked content) — the last transform a text corpus undergoes before
seq2seq pretraining.

Block-aligned deterministic variant: positions partition into fixed
``block``-token blocks; each block draws (md5) whether its head span is
masked and how long the span is (1..``max_span``, capped by the block).
Spans therefore never overlap BY CONSTRUCTION and every decision is a
pure per-row expression — no sequential scan over positions, which is
what makes T5's original left-to-right sampler hostile to both SQL
engines and to vectorization. The expected corruption rate is
``rate_permille/1000 * mean_span/block``; tune the knobs to hit 15%.
Documented divergence from T5: span starts are block-aligned rather
than uniform — the training-objective statistics (span count/length
distribution) are preserved, start-position uniformity is not.

Scale shape: entirely NARROW (split + nested transform/filter over the
per-doc block list) — zero shuffles, scan-bound at any corpus size,
exactly like tokenize/chunk. Everything is md5-derived integers and
string assembly: the DuckDB oracle (q146) replays every masked span
byte-for-byte; the wide input text travels as an md5 fingerprint, the
(short) target travels verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity_dedup import md5_long


def span_corruption(
    docs: DataFrame,
    block: int = 5,
    rate_permille: int = 300,
    max_span: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "t5span",
    fingerprint_input: bool = True,
) -> DataFrame:
    """Mask block-aligned token spans; returns one row per document:
    (id_col, n_tokens, n_spans, n_masked, input_md5, target_text) —
    with ``fingerprint_input=False`` the corrupted input travels
    verbatim as ``input_text`` instead of as a fingerprint (tests,
    small corpora, or when the consumer is the trainer itself).

    ``input_md5`` fingerprints the corrupted input (sentinels replacing
    spans); ``target_text`` is the seq2seq label: each span's sentinel
    followed by the tokens it hid, in order ('' when nothing masked).
    Sentinels are ``<X_k>`` with k counting masked spans left to right.
    """
    if block < 1 or max_span < 1 or max_span > block:
        raise ValueError("need 1 <= max_span <= block")
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    base = docs.select(
        F.col(id_col), toks.alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n = F.col("__n")
    nblocks = F.expr(f"(__n + {block - 1}) DIV {block}")
    blocks = F.when(
        n > 0, F.sequence(F.lit(0), (nblocks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))

    did = F.col(id_col).cast("string")

    def block_struct(b):
        mask_draw = md5_long(
            F.concat(F.lit(salt + ":"), did, F.lit(":"), b.cast("string"))
        )
        len_draw = md5_long(
            F.concat(
                F.lit(salt + "/len:"), did, F.lit(":"), b.cast("string")
            )
        )
        blen = F.least(F.lit(block), n - b * block)
        return F.struct(
            b.alias("b"),
            (b * block).alias("off"),
            blen.alias("len"),
            (F.pmod(mask_draw, F.lit(1000)) < rate_permille).alias(
                "masked"
            ),
            F.least(
                F.lit(1) + F.pmod(len_draw, F.lit(max_span)), blen
            ).alias("span"),
        )

    stage = base.withColumn(
        "__bs", F.transform(blocks, block_struct)
    ).withColumn("__ms", F.filter("__bs", lambda s: s["masked"]))

    t = F.col("__toks")
    ms = F.col("__ms")

    def sentinel(s):
        # k = masked spans strictly before this block
        k = F.size(F.filter(ms, lambda m: m["b"] < s["b"]))
        return F.concat(F.lit("<X_"), k.cast("string"), F.lit(">"))

    def input_part(s):
        whole = F.slice(t, s["off"] + 1, s["len"])
        rest = F.slice(t, s["off"] + s["span"] + 1, s["len"] - s["span"])
        return F.when(
            s["masked"],
            F.concat_ws(" ", F.concat(F.array(sentinel(s)), rest)),
        ).otherwise(F.concat_ws(" ", whole))

    def target_part(s):
        return F.concat_ws(
            " ",
            F.concat(F.array(sentinel(s)), F.slice(t, s["off"] + 1, s["span"])),
        )

    return stage.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(ms).cast("long").alias("n_spans"),
        F.coalesce(
            F.aggregate(
                ms,
                F.lit(0).cast("long"),
                lambda acc, m: acc + m["span"].cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("n_masked"),
        (
            F.md5(
                F.concat_ws(" ", F.transform(F.col("__bs"), input_part))
            ).alias("input_md5")
            if fingerprint_input
            else F.concat_ws(
                " ", F.transform(F.col("__bs"), input_part)
            ).alias("input_text")
        ),
        F.concat_ws(" ", F.transform(ms, target_part)).alias("target_text"),
    )
