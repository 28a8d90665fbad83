"""Scaling probes for the round-10 continuation (second batch)
families: the containment join (q180), the windowed ledger (q184) and
the bucketed co-located join (q181).

    python tools/bench_scaling_r10d.py [k] [scratch_dir]

Claims probed (the committed-number discipline of SCALING_LLM.json —
measure, don't assert):

- ``q180_containment_linear``: the prefix-filtered containment join
  over kx token-decorrelated docs should grow ~linearly in wall and
  candidates (replicas share no tokens, so no cross-replica
  candidates can form — the same argument as the weighted-MinHash
  probe).
- ``q184_windowed_probe_fixed_tranche``: probing a FIXED 1x tranche
  against a windowed ledger holding kx the key volume must stay ~flat
  — the scan is partition-pruned to live epochs x touched buckets and
  the probe work is O(tranche). Expiry at kx is recorded too: it is
  directory metadata work and must not scale with surviving data.
- ``q181_bucketed_vs_shuffle_join``: the same doc↔embedding join at
  kx through pre-bucketed tables vs a plain shuffle join — the
  bucketed read must not be SLOWER (at toy scale both are
  latency-bound; the point of the committed number is honesty, the
  plan pin lives in tests/test_bucketed_tables.py).

Merges results into SCALING_LLM.json in place.
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
NB = 64
EPOCHS = 4


def probe_pair(spark, sf_dir: str, scratch: str, tag: str) -> dict:
    from data_integration_openfoodfacts_spark.operators.containment import (
        containment_pairs,
    )
    from data_integration_openfoodfacts_spark.operators.similarity_dedup import (
        word_shingles,
    )
    from data_integration_openfoodfacts_spark.operators.windowed_ledger import (
        append_window_epoch,
        expire_through,
        score_tranche_windowed,
    )
    from data_integration_openfoodfacts_spark.sources.bucketed_tables import (
        colocated_join,
        create_bucketed_database,
        write_bucketed_table,
    )
    from data_integration_openfoodfacts_spark.sources.parquet_source import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    res: dict = {}

    # --- containment join at this scale ---
    out = containment_pairs(docs, "doc_id", "text", n=3, threshold_pct=90)
    res["containment"] = {
        "sec": time_df(lambda: out),
        "pairs": out.count(),
    }

    # --- windowed ledger: seed with THIS scale's keys, probe a fixed
    # 1x tranche; record expiry wall too ---
    path = os.path.join(scratch, f"win_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    occ = word_shingles(docs, "doc_id", "text", n=3).select(
        (F.col("doc_id") % EPOCHS).alias("epoch"),
        F.md5("shingle").alias("shingle_md5"),
    ).localCheckpoint(eager=True)
    for e in range(EPOCHS):
        append_window_epoch(
            occ.filter(F.col("epoch") == e).select("shingle_md5"),
            "shingle_md5", path, e, NB,
        )
    base = load_table(spark, SF_DIR, "documents")
    tranche = word_shingles(
        base.filter(F.col("doc_id") % 7 == 0), "doc_id", "text", n=3
    ).select(F.md5("shingle").alias("shingle_md5")).localCheckpoint(
        eager=True
    )
    res["windowed_probe"] = {
        "sec": time_df(
            lambda: score_tranche_windowed(tranche, "shingle_md5", path)
        ),
        "store_rows": spark.read.parquet(path).count(),
    }
    import time as _t

    t0 = _t.time()
    expire_through(spark, path, 0)
    res["windowed_expire_sec"] = round(_t.time() - t0, 2)

    # --- bucketed vs shuffle join at this scale ---
    emb = load_table(spark, sf_dir, "embeddings")
    db = f"probe_{tag}"
    loc = os.path.join(scratch, f"bt_{tag}")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    create_bucketed_database(spark, db, loc)
    write_bucketed_table(
        docs.select("doc_id", "lang", "n_chars"), f"{db}.d", "doc_id", 16
    )
    write_bucketed_table(
        emb.select("vec_id", "label"), f"{db}.e", "vec_id", 16
    )
    res["join_bucketed_sec"] = time_df(
        lambda: colocated_join(spark, f"{db}.d", f"{db}.e",
                               "doc_id", "vec_id")
    )
    plain_d = docs.select("doc_id", "lang", "n_chars")
    plain_e = emb.select("vec_id", "label").hint("merge")
    res["join_shuffle_sec"] = time_df(
        lambda: plain_d.join(
            plain_e, plain_d["doc_id"] == F.col("vec_id")
        )
    )
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    return res


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="r10d_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark()
    big_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, big_dir, k)
    base = probe_pair(spark, SF_DIR, scratch, "base")
    big = probe_pair(spark, big_dir, scratch, "big")
    out = {
        "q180_containment_linear": {
            "base_sec": base["containment"]["sec"],
            f"x{k}_sec": big["containment"]["sec"],
            "growth": round(
                big["containment"]["sec"]
                / max(base["containment"]["sec"], 1e-9), 2
            ),
            "base_pairs": base["containment"]["pairs"],
            f"x{k}_pairs": big["containment"]["pairs"],
        },
        "q184_windowed_probe_fixed_tranche": {
            "base_sec": base["windowed_probe"]["sec"],
            f"x{k}_sec": big["windowed_probe"]["sec"],
            "growth": round(
                big["windowed_probe"]["sec"]
                / max(base["windowed_probe"]["sec"], 1e-9), 2
            ),
            "store_rows_base": base["windowed_probe"]["store_rows"],
            f"store_rows_x{k}": big["windowed_probe"]["store_rows"],
            "expire_sec_base": base["windowed_expire_sec"],
            f"expire_sec_x{k}": big["windowed_expire_sec"],
        },
        "q181_bucketed_vs_shuffle_join": {
            "bucketed_sec_base": base["join_bucketed_sec"],
            f"bucketed_sec_x{k}": big["join_bucketed_sec"],
            "shuffle_sec_base": base["join_shuffle_sec"],
            f"shuffle_sec_x{k}": big["join_shuffle_sec"],
        },
    }
    path = os.path.join(REPO, "SCALING_LLM.json")
    data = json.load(open(path))
    data["queries"].update(out)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
