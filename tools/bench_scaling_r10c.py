"""Scaling probes for the round-10 continuation families: the
counting-Bloom screen (q176/q178) and the integer-weighted MinHash
(q177).

    python tools/bench_scaling_r10c.py [k] [scratch_dir]

Claims probed (the committed-number discipline of SCALING_LLM.json —
measure, don't assert):

- ``q178_counting_probe_fixed_batch``: probing a FIXED 1x batch of
  shingle keys against a counting store seeded with kx the corpus
  must stay FLAT — the store's live table is bounded by m positions
  no matter how many occurrences ever inserted (the same fixed-size
  argument as q170's bit screen, which measured 0.48x at a 30x store).
- ``q177_weighted_minhash_linear``: the end-to-end weighted near-dup
  pass (tf -> replication-expanded signatures -> bucket-capped LSH ->
  exact J_W verify) over kx token-decorrelated docs should scale
  ~linearly in wall with candidates not super-linear (replicas share
  no tokens, so cross-replica buckets cannot form).

Reuses bench_scaling_llm's replication and timing so the numbers sit
comparably next to the existing k10/k30 entries. Merges results into
SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scaling_llm import SF_DIR, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NW = 1 << 16  # counting-store geometry for the probe (bit screen's default)
K = 5


def probe_pair(spark, sf_dir: str, scratch: str) -> dict:
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        word_shingles,
    )
    from data_integration_openfoodfacts_spark.operators.weighted_minhash import (
        token_tf,
        verify_weighted_jaccard,
        weighted_minhash_pairs,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )
    from data_integration_openfoodfacts_spark.streaming.counting_store import (
        compact_counting,
        probe_counting,
        write_counting_delta,
    )

    docs = load_table(spark, sf_dir, "documents")
    res: dict = {}

    # --- counting store: seed with THIS scale's occurrences, probe a
    # fixed 1x batch (the batch never grows with the store) ---
    store = os.path.join(scratch, "cnt_store")
    shutil.rmtree(store, ignore_errors=True)
    occ = word_shingles(docs, "doc_id", "text", n=3)
    write_counting_delta(
        occ.select("shingle"), "shingle", store, "batch-0", NW, K
    )
    compact_counting(spark, store, NW, K)
    base = load_table(spark, SF_DIR, "documents")
    fixed_batch = word_shingles(
        base.filter(F.col("doc_id") % 7 == 0), "doc_id", "text", n=3
    ).select("shingle").localCheckpoint(eager=True)
    res["counting_probe_fixed_batch"] = {
        "sec": time_df(
            lambda: probe_counting(fixed_batch, "shingle", store, NW, K)
        ),
        "store_occurrences": occ.count(),
    }

    # --- weighted minhash end-to-end at this scale ---
    tf = token_tf(docs, "doc_id", "text", cap=8).localCheckpoint(eager=True)
    cands = weighted_minhash_pairs(tf, "doc_id")
    n_cands = cands.count()
    res["weighted_minhash_e2e"] = {
        "sec": time_df(
            lambda: verify_weighted_jaccard(
                tf,
                weighted_minhash_pairs(tf, "doc_id"),
                "doc_id",
                0.7,
            )
        ),
        "candidate_pairs": n_cands,
    }
    return res


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="scaling_r10c_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("scaling-r10c")
    spark.sparkContext.setLogLevel("ERROR")

    kx_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, kx_dir, k)

    base = probe_pair(spark, SF_DIR, os.path.join(scratch, "b1"))
    scaled = probe_pair(spark, kx_dir, os.path.join(scratch, f"b{k}"))

    entries = {
        f"q178_counting_probe_fixed_batch_k{k}": {
            "base_sec": base["counting_probe_fixed_batch"]["sec"],
            f"x{k}_sec": scaled["counting_probe_fixed_batch"]["sec"],
            "growth": round(
                scaled["counting_probe_fixed_batch"]["sec"]
                / max(base["counting_probe_fixed_batch"]["sec"], 1e-9),
                2,
            ),
            "base_store_occurrences": base["counting_probe_fixed_batch"][
                "store_occurrences"
            ],
            f"x{k}_store_occurrences": scaled["counting_probe_fixed_batch"][
                "store_occurrences"
            ],
        },
        f"q177_weighted_minhash_linear_k{k}": {
            "base_sec": base["weighted_minhash_e2e"]["sec"],
            f"x{k}_sec": scaled["weighted_minhash_e2e"]["sec"],
            "growth": round(
                scaled["weighted_minhash_e2e"]["sec"]
                / max(base["weighted_minhash_e2e"]["sec"], 1e-9),
                2,
            ),
            "base_candidates": base["weighted_minhash_e2e"][
                "candidate_pairs"
            ],
            f"x{k}_candidates": scaled["weighted_minhash_e2e"][
                "candidate_pairs"
            ],
        },
    }
    print(json.dumps(entries, indent=1))

    path = os.path.join(REPO, "SCALING_LLM.json")
    rec = json.load(open(path))
    rec["queries"].update(entries)
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
