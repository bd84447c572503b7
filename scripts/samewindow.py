"""Same-window engine-vs-engine comparison (NOTES.md protocol).

This host's 32-thread wall times swing ±25% between windows, so a candidate
and a baseline commit are only comparable when measured back-to-back in the
SAME window. This script `git archive`s a baseline sha into a temp dir, then
runs `bench.py` alternately from the baseline tree and the working tree
(interleaved, order-balanced, REPS times each), and reports per-tree
medians. Two modes:

* default (crawl): `bench.py --crawl-only`, compares crawl urls/sec;
* `--queries`: the FULL bench (query suite + crawl), compares the query
  suite per-query and on the comparable subset — the r4→r5 adjudication
  the r4 verdict demanded for the +16% suite / +42% shipping_priority
  cross-window deltas.

Run:  python scripts/samewindow.py <baseline-sha> [reps] [--queries]
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


def run_bench(tree: Path, crawl_only: bool = True) -> dict:
    cmd = [sys.executable, str(tree / "bench.py")]
    if crawl_only:
        cmd.append("--crawl-only")
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=str(tree))
    if out.returncode != 0:
        raise RuntimeError(f"bench failed in {tree}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_crawl(tree: Path) -> float:
    return run_bench(tree, crawl_only=True)["crawl"]["urls_per_sec"]


def queries_mode(base: Path, reps: int) -> None:
    """Order-balanced full-bench pairs; per-query medians + ratios on the
    intersection of the two trees' suites (compositions differ across
    rounds — totals are only quoted on the comparable subset)."""
    runs: dict[str, list[dict]] = {"baseline": [], "candidate": []}
    for tree in (base, REPO):  # discarded cold-cache warmups
        run_bench(tree, crawl_only=False)
    for i in range(reps):
        order = (("baseline", base), ("candidate", REPO)) if i % 2 == 0 \
            else (("candidate", REPO), ("baseline", base))
        for tag, tree in order:
            runs[tag].append(run_bench(tree, crawl_only=False))
        print(f"pair {i}: baseline suite "
              f"{runs['baseline'][-1]['value']} s, candidate suite "
              f"{runs['candidate'][-1]['value']} s", file=sys.stderr)

    common = sorted(
        set(runs["baseline"][0]["queries"]) & set(runs["candidate"][0]["queries"]))
    per_query = {}
    for q in common:
        b = statistics.median(r["queries"][q] for r in runs["baseline"])
        c = statistics.median(r["queries"][q] for r in runs["candidate"])
        per_query[q] = {"baseline_s": round(b, 3), "candidate_s": round(c, 3),
                        "ratio": round(c / b, 3) if b else None}
    b_tot = round(sum(v["baseline_s"] for v in per_query.values()), 3)
    c_tot = round(sum(v["candidate_s"] for v in per_query.values()), 3)
    print(json.dumps({
        "mode": "queries", "reps": reps, "comparable_queries": common,
        "per_query": per_query,
        "comparable_suite_s": {"baseline": b_tot, "candidate": c_tot,
                               "ratio": round(c_tot / b_tot, 3)},
        "crawl_median_urls_per_sec": {
            k: statistics.median(r["crawl"]["urls_per_sec"] for r in v)
            for k, v in runs.items()},
        "raw_suite_s": {k: [r["value"] for r in v] for k, v in runs.items()},
        "raw_queries": {k: [r["queries"] for r in v] for k, v in runs.items()},
    }))


def main() -> None:
    sha = sys.argv[1]
    tail = [a for a in sys.argv[2:] if a != "--queries"]
    want_queries = "--queries" in sys.argv[2:]
    reps = int(tail[0]) if tail else 3
    with tempfile.TemporaryDirectory(prefix="samewindow_") as td:
        base = Path(td) / "baseline"
        base.mkdir()
        # check=True: a bad/unknown sha must fail HERE with git's message,
        # not later as an opaque FileNotFoundError from an empty tree
        tar = subprocess.run(["git", "archive", sha], capture_output=True,
                             cwd=str(REPO), check=True)
        subprocess.run(["tar", "x"], input=tar.stdout, cwd=str(base), check=True)
        if want_queries:
            queries_mode(base, reps)
            return
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
