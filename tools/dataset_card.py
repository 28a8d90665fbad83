"""Emit a dataset-card JSON for a curated corpus — the composition
artifact a training-data release ships, assembled from the engine's
oracle-gated queries in one session:

- ``curation``: the per-stage ledger (q148 — observe-counted, one
  execution);
- ``composition``: the per-source profile (q156 — volume, language
  diversity, exact-dup and classifier keep rates);
- ``drop_attribution``: how many documents each stage removed (q161's
  per-doc table rolled up — reconciles with the ledger by test);
- ``novelty``: the marginal-novelty curve by ingestion tranche (q157).

    python tools/dataset_card.py [sf_dir] [out.json]

Everything here is a thin driver over already-verified queries — the
card inherits their correctness gates.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_card(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.plans.curation_queries import (
        q156_corpus_source_profile,
        q157_novelty_curve,
    )
    from data_integration_openfoodfacts_spark.plans.hygiene_queries import (
        q161_drop_attribution,
    )
    from data_integration_openfoodfacts_spark.plans.llm_queries import (
        q148_corpus_curation_pipeline,
    )
    from pyspark.sql import functions as F

    ledger = [
        {"stage_no": r["stage_no"], "stage": r["stage"],
         "n_docs": r["n_docs"]}
        for r in q148_corpus_curation_pipeline(spark, sf_dir).collect()
    ]
    composition = [
        r.asDict()
        for r in q156_corpus_source_profile(spark, sf_dir)
        .orderBy("source").collect()
    ]
    drops = [
        r.asDict()
        for r in q161_drop_attribution(spark, sf_dir)
        .groupBy("dropped_at")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("dropped_at")
        .collect()
    ]
    novelty = [
        r.asDict() for r in q157_novelty_curve(spark, sf_dir).collect()
    ]
    return {
        "source_dir": sf_dir,
        "curation": ledger,
        "composition": composition,
        "drop_attribution": drops,
        "novelty": novelty,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dataset_card.json"
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("dataset-card")
    spark.sparkContext.setLogLevel("ERROR")
    card = build_card(spark, sf_dir)
    with open(out, "w") as fh:
        json.dump(card, fh, indent=1, default=str)
    print(f"wrote {out}: stages={len(card['curation'])} "
          f"sources={len(card['composition'])} "
          f"tranches={len(card['novelty'])}")


if __name__ == "__main__":
    main()
