"""Same-window engine-vs-engine crawl comparison (NOTES.md protocol).

This host's 32-thread wall times swing ±25% between windows, so a candidate
and a baseline commit are only comparable when measured back-to-back in the
SAME window. This script `git archive`s a baseline sha into a temp dir, then
runs `bench.py --crawl-only` alternately from the baseline tree and the
working tree (interleaved, REPS times each), and reports per-tree medians.

Run:  python scripts/samewindow.py <baseline-sha> [reps]
Env:  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS forwarded to both trees.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_crawl(tree: Path) -> float:
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py"), "--crawl-only"],
        capture_output=True, text=True, cwd=str(tree),
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["crawl"]["urls_per_sec"]


def main() -> None:
    sha = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    with tempfile.TemporaryDirectory(prefix="samewindow_") as td:
        base = Path(td) / "baseline"
        base.mkdir()
        # check=True: a bad/unknown sha must fail HERE with git's message,
        # not later as an opaque FileNotFoundError from an empty tree
        tar = subprocess.run(["git", "archive", sha], capture_output=True,
                             cwd=str(REPO), check=True)
        subprocess.run(["tar", "x"], input=tar.stdout, cwd=str(base), check=True)
        runs: dict[str, list[float]] = {"baseline": [], "candidate": []}
        # one discarded warmup per tree: the first run after a tree switch
        # pays cold OS page cache for the corpus — measured as a consistent
        # second-runner-wins bias (~±25%) without this
        for tree in (base, REPO):
            run_crawl(tree)
        for i in range(reps):
            # alternate which tree goes first: a window that decays
            # monotonically would otherwise always tax the second runner
            order = (("baseline", base), ("candidate", REPO)) if i % 2 == 0 \
                else (("candidate", REPO), ("baseline", base))
            for tag, tree in order:
                runs[tag].append(run_crawl(tree))
            print(f"pair {i}: baseline {runs['baseline'][-1]} "
                  f"candidate {runs['candidate'][-1]}", file=sys.stderr)
    med = {k: statistics.median(v) for k, v in runs.items()}
    print(json.dumps({
        "baseline_sha": sha, "reps": reps, "runs": runs,
        "median_urls_per_sec": med,
        "candidate_over_baseline": round(med["candidate"] / med["baseline"], 3),
    }))


if __name__ == "__main__":
    main()
