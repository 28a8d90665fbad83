"""Dump `.explain("formatted")` for the round-13-touched queries into
plans/r13/<qN>_<tag>.txt (the optimization-round plan evidence).

    python tools/dump_explains_r13.py <tag> [outdir] [query ...]

``tag`` is ``before`` (run from a scratch worktree of the round-12
close-out commit) or ``after`` (run at HEAD). Queries default to the
round-13-touched set. Lifecycle queries execute their store actions at
sf0.001 while building the returned frame; the dumped plan is the
final declared frame's — the same one the bench noop-sinks.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

DEFAULT_QUERIES = [
    "q200_incremental_components",
    "q201_component_ledger_lifecycle",
    "q202_neardup_ingest_component_lifecycle",
    "q203_component_ledger_takedown",
    "q198_semdedup_fixed_cluster",
    "q75_semantic_dedup",
    "q188_quality_canonical_dedup",
    "q171_binary_simhash",
]


def main() -> None:
    tag = sys.argv[1]
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/plans/r13"
    )
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)

    from data_integration_openfoodfacts_spark.plans.registry import QUERIES
    from data_integration_openfoodfacts_spark.session import get_spark

    spark = get_spark("explain-r13")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not in this revision's registry")
            continue
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        q = name.split("_", 1)[0]
        path = os.path.join(outdir, f"{q}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(f"# {name} — explain('formatted') at sf0.001 [{tag}]\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
