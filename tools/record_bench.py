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
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "data_integration_openfoodfacts_spark", "plans")
HIST = os.path.join(PLANS, "bench_history")


def dirty_bench_artifacts(exclude: set[str] | None = None) -> list[str]:
    """Repo-relative bench artifacts (bench_report.json + anything in
    bench_history/) that differ from HEAD or are untracked. Round-9
    left bench_report.json modified at HEAD after the close-out — the
    protocol artifact the NEXT round's regression gate reads — so the
    recorder now refuses to stack a new record on top of unexplained
    leftovers (round-10 VERDICT #6)."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--",
             os.path.relpath(os.path.join(PLANS, "bench_report.json"), REPO),
             os.path.relpath(HIST, REPO)],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return []  # not a git checkout (driver sandbox) — nothing to gate
    paths = [line[3:].strip() for line in out.splitlines() if line.strip()]
    return [p for p in paths if p not in (exclude or set())]


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
    # The bench run this call snapshots legitimately dirtied
    # bench_report.json; anything ELSE dirty under the bench paths is a
    # previous round's unfinished protocol — recording on top of it
    # would bury the evidence, so fail loudly instead (--force skips).
    force = "--force" in sys.argv
    argv = [a for a in sys.argv if a != "--force"]
    rel_src = os.path.relpath(src, REPO)
    leftovers = dirty_bench_artifacts(exclude={rel_src})
    if leftovers and not force:
        print(
            "REFUSING to record: uncommitted bench artifacts from a "
            "previous run are still in the working tree —"
        )
        for p in leftovers:
            print(f"  {p}")
        print(
            "commit them (end-of-round protocol step 4) or rerun with "
            "--force if they are intentionally superseded."
        )
        return 2
    n = int(argv[1]) if len(argv) > 1 else max_round() + 1
    with open(src) as f:
        rec = json.load(f)
    rec["round"] = n
    os.makedirs(HIST, exist_ok=True)
    dst = os.path.join(HIST, f"r{n:02d}.json")
    with open(dst, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"recorded round {n}: {len(rec.get('queries', {}))} queries -> {dst}")
    to_commit = dirty_bench_artifacts()
    if to_commit:
        print("PROTOCOL: commit these now (git add " + " ".join(to_commit) + ")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
