"""Per-query core-scaling legs for the training-pipeline operators.

r4 verdict #6: the training-pipeline queries are half the catalog but none
had a 1-vs-4-core leg in the scaling artifacts. This driver runs a query
subset (default: the three shipped into the bench headline set this round —
dedup_lines, pack_sequences, posting_lists) via ``bench.py --queries-only``
in fresh JVMs at local[1] and local[4], interleaved 1,4,1,4,… over REPS
pairs, and reports the median per-query wall at each level plus the
core-scaling ratio wall(1)/wall(4) (4.0 = perfectly linear; the sandbox's
memory-bandwidth ceiling — see BENCH/BASELINE.md host context — bounds
bandwidth-heavy queries well below that regardless of plan quality).

Run:  python BENCH/queries_scaling.py            # writes JSON to stdout
Env:  SPARK_GRAFT_SF_DIR       corpus (default /root/testdata/sf0.1)
      SPARK_GRAFT_QSCALING_REPS pairs (default 3)
      SPARK_GRAFT_QUERY_SUBSET  comma list (default the three below)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_QSCALING_REPS", "3"))
SUBSET = os.environ.get(
    "SPARK_GRAFT_QUERY_SUBSET", "dedup_lines,pack_sequences,posting_lists")


def run_at(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_SF_DIR=SF_DIR, SPARK_GRAFT_QUERY_SUBSET=SUBSET)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--queries-only"],
        env=env, capture_output=True, text=True, cwd=str(REPO))
    if out.returncode != 0:
        raise RuntimeError(f"bench --queries-only failed at {cores} cores:\n"
                           f"{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    runs: dict[int, list[dict]] = {1: [], 4: []}
    for rep in range(REPS):
        for cores in (1, 4):
            runs[cores].append(run_at(cores)["queries"])
            print(f"rep {rep} cores {cores}: {runs[cores][-1]}",
                  file=sys.stderr)
    per_query = {}
    for q in SUBSET.split(","):
        w1 = statistics.median(r[q] for r in runs[1])
        w4 = statistics.median(r[q] for r in runs[4])
        per_query[q] = {"wall_1core_s": round(w1, 3),
                        "wall_4core_s": round(w4, 3),
                        "speedup_1_to_4": round(w1 / w4, 2) if w4 else None}
    print(json.dumps({
        "metric": "query wall 1-core vs 4-core (median of interleaved reps)",
        "sf": Path(SF_DIR).name, "reps": REPS,
        "per_query": per_query,
        "raw": {str(k): v for k, v in runs.items()},
    }))


if __name__ == "__main__":
    main()
