"""Compaction-vs-rebuild probe (round-7): when the near-dup band
ledger outgrows its width, is re-banding from the STORED SIGS
(`compact_band_ledger` — ledger-local, zero text) actually cheaper
than rebuilding the index from corpus text
(`minhash_band_signatures`)? Measured at a Kx decorrelated corpus, not
assumed — the same honesty rule as SCALING_LLM.json's other entries.

At probe scale the text rebuild is small; the COST CLASSES are the
point: rebuild = shingle + md5 + minima over every corpus token
(O(corpus text)), compaction = one groupBy over ledger rows
(O(ledger) = O(docs * bands), no text). Both outputs are asserted
bitwise equal before timing counts.

    python tools/bench_scaling_compaction.py [K]

Appends results under SCALING_LLM.json "queries" as
"band_compaction_vs_rebuild".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        compact_band_ledger,
        minhash_band_signatures,
    )
    from data_integration_openfoodfacts_spark.session import get_spark
    from tools.bench_scaling_novelty import decorrelated_docs

    spark = get_spark("bench-scaling-compaction")
    spark.sparkContext.setLogLevel("ERROR")

    docs = decorrelated_docs(spark, SF_DIR, k).localCheckpoint(True)
    narrow = minhash_band_signatures(
        docs, "doc_id", "text", num_hashes=8, band_size=2
    ).localCheckpoint(True)
    n_ledger = narrow.count()

    def timed(fn):
        # warm once, then min of 2
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    def compact():
        compact_band_ledger(narrow, "doc_id", 2, 4).write.format(
            "noop"
        ).mode("overwrite").save()

    def rebuild():
        minhash_band_signatures(
            docs, "doc_id", "text", num_hashes=8, band_size=4
        ).write.format("noop").mode("overwrite").save()

    # equality gate before any timing counts (fast-but-wrong rule)
    a = {tuple(r) for r in compact_band_ledger(narrow, "doc_id", 2, 4).collect()}
    b = {
        tuple(r)
        for r in minhash_band_signatures(
            docs, "doc_id", "text", num_hashes=8, band_size=4
        ).collect()
    }
    assert a == b, "compacted ledger != fresh wide index"

    compact_sec = timed(compact)
    rebuild_sec = timed(rebuild)
    entry = {
        "k": k,
        "ledger_rows": n_ledger,
        "compact_sec": round(compact_sec, 2),
        "rebuild_sec": round(rebuild_sec, 2),
        "speedup": round(rebuild_sec / compact_sec, 2),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LLM.json",
    )
    rep = json.load(open(path))
    rep["queries"]["band_compaction_vs_rebuild"] = entry
    json.dump(rep, open(path, "w"), indent=1)
    print(json.dumps({"band_compaction_vs_rebuild": entry}))


if __name__ == "__main__":
    main()
