"""Scaling probes for the round-11 text/quality families: repetition
rules (q195), classifier-vs-rules calibration (q196) and the drift
profile (q197).

    python tools/bench_scaling_r11b.py [k] [scratch_dir]

Claims probed (SCALING_LLM.json's committed-number discipline): all
three are scan-bound — one or two linear passes with map-side-combined
doc-keyed aggregations and constant-size outputs — so wall must grow
~linearly (or better, while fixed overheads amortize) in corpus size.
Merges results into SCALING_LLM.json in place.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling_llm import SF_DIR, replicate, time_df  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(spark, sf_dir: str) -> dict:
    from data_integration_openfoodfacts_spark.plans.drift_queries import (
        q197_source_drift_monitor,
    )
    from data_integration_openfoodfacts_spark.plans.quality_calibration_queries import (  # noqa: E501
        q196_classifier_rule_calibration,
    )
    from data_integration_openfoodfacts_spark.plans.repetition_queries import (  # noqa: E501
        q195_repetition_rules,
    )

    return {
        "repetition": time_df(lambda: q195_repetition_rules(spark, sf_dir)),
        "calibration": time_df(
            lambda: q196_classifier_rule_calibration(spark, sf_dir)
        ),
        "drift": time_df(lambda: q197_source_drift_monitor(spark, sf_dir)),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scratch = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="r11b_")
    )
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    big_dir = os.path.join(scratch, f"sf_x{k}")
    replicate(spark, SF_DIR, big_dir, k)
    base = probe(spark, SF_DIR)
    big = probe(spark, big_dir)
    sfx = "" if k == 10 else f"_k{k}"
    out = {
        f"q{qn}_{name}_scan_linear{sfx}": {
            "base_sec": base[key],
            f"x{k}_sec": big[key],
            "growth": round(big[key] / max(base[key], 1e-9), 2),
        }
        for qn, name, key in [
            (195, "repetition", "repetition"),
            (196, "calibration", "calibration"),
            (197, "drift", "drift"),
        ]
    }
    path = os.path.join(REPO, "SCALING_LLM.json")
    with open(path) as f:
        rec = json.load(f)
    rec["queries"].update(out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
