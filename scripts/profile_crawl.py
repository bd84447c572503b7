"""Stage-level wall-clock profile of the crawl loop (NOTES.md playbook).

Monkeypatches SnapshotStore I/O methods with timing wrappers and runs the
same crawl as ``bench.py --crawl-only`` at SPARK_GRAFT_CPUS cores, printing
per-call and per-table aggregates plus the serial driver timeline. Used to
decompose the N-vs-4N scaling gap into (a) driver fixed cost, (b) bandwidth-
bound sink time, (c) CPU stage time.

Run:  SPARK_GRAFT_CPUS=1 SPARK_GRAFT_CRAWL_SCALE=40,10,400,80 \
          python scripts/profile_crawl.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
SCALE = os.environ.get("SPARK_GRAFT_CRAWL_SCALE", "40,10,400,80")

EVENTS: list[dict] = []
_LOCK = threading.Lock()


def _wrap(cls, method_name: str) -> None:
    orig = getattr(cls, method_name)

    def timed(self, *args, **kwargs):
        # table name is always a positional str arg (varies per method)
        table = next((a for a in args if isinstance(a, str)), "?")
        t0 = time.time()
        try:
            return orig(self, *args, **kwargs)
        finally:
            with _LOCK:
                EVENTS.append({
                    "op": method_name, "table": table,
                    "t0": round(t0, 3), "dur": round(time.time() - t0, 3),
                    "thread": threading.current_thread().name,
                })

    setattr(cls, method_name, timed)


def main() -> None:
    from bench import bench_tmp_root
    from crawler_spark.session import build_session
    from crawler_spark.sources.tables import SnapshotStore

    for m in ("replace_buckets", "replace_buckets_task_write", "write",
              "append", "materialize", "read_buckets", "read", "commit"):
        _wrap(SnapshotStore, m)

    import shutil

    local_dir = tempfile.mkdtemp(prefix="spark_local_", dir=bench_tmp_root())
    spark = build_session(app_name="crawl_profile", cores=CPUS,
                          extra_conf={"spark.local.dir": local_dir})
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from bench import run_crawl_bench
        if os.environ.get("SPARK_GRAFT_CRAWL_WARMUP", "1") != "0":
            # match the scaling harness: tiny untimed warmup crawl so JIT/
            # codegen/worker spinup is outside the profiled region, then
            # drop its events from the report
            run_crawl_bench(spark, "profile", CPUS, scale=(20, 4, 50, 8))
            with _LOCK:
                EVENTS.clear()
        t_all = time.time()
        crawl = run_crawl_bench(spark, "profile", CPUS)
        total = time.time() - t_all
    finally:
        spark.stop()
        shutil.rmtree(local_dir, ignore_errors=True)

    # ---- report ----
    by_key: dict[tuple[str, str], list[float]] = {}
    for e in EVENTS:
        by_key.setdefault((e["op"], e["table"]), []).append(e["dur"])
    print(f"\n=== crawl profile @ local[{CPUS}] scale={SCALE} ===")
    print(json.dumps(crawl))
    print(f"total wall (incl. setup/teardown): {total:.1f}s\n")
    print(f"{'op':<16} {'table':<22} {'n':>4} {'sum_s':>8} {'max_s':>7}")
    for (op, table), durs in sorted(by_key.items(), key=lambda kv: -sum(kv[1])):
        print(f"{op:<16} {table:<22} {len(durs):>4} {sum(durs):>8.2f} {max(durs):>7.2f}")

    # serial driver timeline: events on MainThread only (pool threads overlap)
    main_events = [e for e in EVENTS if e["thread"] == "MainThread"]
    main_sum = sum(e["dur"] for e in main_events)
    pool_sum = sum(e["dur"] for e in EVENTS) - main_sum
    print(f"\nMainThread store-call time (serial path): {main_sum:.1f}s")
    print(f"Pool-thread store-call time (overlapped):  {pool_sum:.1f}s")
    out = REPO / "BENCH" / f"profile_c{CPUS}.json"
    out.write_text(json.dumps({"cpus": CPUS, "scale": SCALE, "crawl": crawl,
                               "total_wall": round(total, 1),
                               "events": EVENTS}, indent=1))
    print(f"raw events -> {out}")


if __name__ == "__main__":
    main()
