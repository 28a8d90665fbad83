"""Snapshot the latest bench run into the committed per-round history.

    python tools/record_bench.py [round_number]

Copies ``data_integration_openfoodfacts_spark/plans/bench_report.json``
(written by every ``python bench.py`` run — the FULL record, including
the per-query timing map that no longer fits the driver's 2,000-char
stdout tail capture, round-7 VERDICT #2) to
``.../plans/bench_history/r{N:02d}.json``.

Without an argument, N = max existing history/BENCH_r round + 1 — i.e.
"this run is the upcoming round's record". Run this ONCE per round,
after the final bench run, then commit the file; bench.py's regression
gate compares each run against the newest committed same-sf record.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "data_integration_openfoodfacts_spark", "plans")
HIST = os.path.join(PLANS, "bench_history")


def max_round() -> int:
    best = 0
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")) + glob.glob(
        os.path.join(HIST, "r*.json")
    ):
        m = re.match(r"(?:BENCH_)?r(\d+)\.json$", os.path.basename(path))
        if m:
            best = max(best, int(m.group(1)))
    return best


def main() -> int:
    src = os.path.join(PLANS, "bench_report.json")
    if not os.path.exists(src):
        print(f"no {src} — run `python bench.py` first")
        return 1
    n = int(sys.argv[1]) if len(sys.argv) > 1 else max_round() + 1
    with open(src) as f:
        rec = json.load(f)
    rec["round"] = n
    os.makedirs(HIST, exist_ok=True)
    dst = os.path.join(HIST, f"r{n:02d}.json")
    with open(dst, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"recorded round {n}: {len(rec.get('queries', {}))} queries -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
