"""Decompose the documents-sink 1-vs-4-core scaling (round-4 instrument).

The round-4 scaling attempt (BENCH/scaling_r4_attempt1.json, efficiency
0.452 with the bandwidth gate OPEN at ratio 5.21) ran at a workload scale
where ``replace_buckets(documents)`` is ~80% of crawl wall (BENCH/
profile_c4.json).  This script isolates which docsink component fails to
scale 1→4 on this host:

* ``pyonly``   — stub_embedding_batch in bare processes (no Spark): the
                 host's pure-CPU scaling ceiling for the embed kernel.
                 (Measured separately: eff 0.87-0.93 in sane windows.)
* ``embed``    — repartition → pandas-UDF embed → JVM agg over the bytes
                 (Arrow Python→JVM transfer paid, no parquet write).
* ``write``    — repartition → constant 6144-B binary (JVM-side lit, no
                 Python) → partitioned parquet write (shuffle+write only;
                 the dynamic-partition write sorts by _b first).
* ``wcw``      — ``write`` with spark.sql.maxConcurrentOutputFileWriters=40
                 (concurrent writers skip the partition sort).
* ``full``     — repartition → embed UDF → partitioned parquet write
                 (the real sink pipeline).

Each (variant, cores) cell is run REPS times, interleaved across the full
variant × cores grid so a host-window shift hits all cells; the median run
is reported (this VM's wall clock swings ±25-50% between adjacent minutes).

Run:  python scripts/docsink_scaling.py [n_rows] [reps]  (default 300_000, 3)
Output: BENCH/docsink_scaling.json + human table on stdout.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_BUCKETS = 16
CORES = (1, 4)


def _py_worker(n, q):
    from crawler_spark.functions.embed import stub_embedding_batch

    texts = [f"synthetic doc text number {i} with some padding tokens" for i in range(2048)]
    t0 = time.time()
    done = 0
    while done < n:
        stub_embedding_batch(texts)
        done += len(texts)
    q.put(n / (time.time() - t0))


def pyonly(procs: int, n: int) -> float:
    """Rows/s of the bare embed kernel across ``procs`` processes."""
    q = mp.Queue()
    ps = [mp.Process(target=_py_worker, args=(n // procs, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return round(sum(q.get() for _ in ps), 1)


def spark_variant(cores: int, variant: str, n: int) -> float:
    """Rows/s of one docsink component at ``cores`` via a fresh subprocess."""
    code = f"""
import json, sys, tempfile, time, shutil
sys.path.insert(0, {str(REPO)!r})
from bench import bench_tmp_root
from crawler_spark.session import build_session
import pyspark.sql.functions as F

root = bench_tmp_root() or tempfile.gettempdir()
local = tempfile.mkdtemp(prefix="dsb_local_", dir=root)
out = tempfile.mkdtemp(prefix="dsb_out_", dir=root)
conf = {{"spark.local.dir": local}}
if "{variant}" == "wcw":
    conf["spark.sql.maxConcurrentOutputFileWriters"] = "40"
spark = build_session(app_name="docsink_ab", cores={cores}, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
try:
    rows = (spark.range({n})
            .select(F.col("id"),
                    F.concat(F.lit("synthetic doc text number "),
                             F.col("id").cast("string"),
                             F.lit(" with some padding tokens")).alias("t"),
                    F.pmod(F.hash("id"), F.lit({N_BUCKETS})).alias("bucket")))
    rows = rows.repartition({N_BUCKETS} * 2, F.col("bucket"),
                            F.pmod(F.hash("id"), F.lit(8)))
    if "{variant}" in ("write", "wcw"):
        emb = F.lit(bytes(6144)).alias("embedding")
    else:
        from crawler_spark.functions.embed import embed_binary_udf
        emb = embed_binary_udf(F.col("t")).alias("embedding")
    df = rows.select("bucket", "id", "t", emb)
    t0 = time.time()
    if "{variant}" in ("full", "write", "wcw"):
        (df.withColumn("_b", F.col("bucket")).write.mode("overwrite")
           .partitionBy("_b").option("compression", "uncompressed")
           .parquet(out + "/p"))
    else:  # embed: force UDF + Arrow transfer, no parquet write
        df.select(F.sum(F.length("embedding"))).collect()
    dur = time.time() - t0
    print(json.dumps({{"rps": {n} / dur, "dur": dur}}))
finally:
    spark.stop()
    shutil.rmtree(local, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
"""
    import subprocess

    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=str(REPO))
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-2000:])
    return round(json.loads(r.stdout.strip().splitlines()[-1])["rps"], 1)


VARIANTS = ("write", "wcw", "embed", "full")


def main() -> None:
    import statistics

    runs: dict[tuple[str, int], list[float]] = {
        (v, c): [] for v in VARIANTS for c in CORES}
    for rep in range(REPS):
        for variant in VARIANTS:
            for cores in CORES:
                rps = spark_variant(cores, variant, N_ROWS)
                runs[(variant, cores)].append(rps)
                print(f"rep{rep} {variant:<6} {cores}c  {rps:>9} rows/s",
                      flush=True)
    res: dict = {"n_rows": N_ROWS, "reps": REPS, "variants": {}}
    for variant in VARIANTS:
        per = {str(c): statistics.median(runs[(variant, c)]) for c in CORES}
        per["all"] = {str(c): runs[(variant, c)] for c in CORES}
        per["efficiency"] = round(per["4"] / (4 * per["1"]), 3)
        res["variants"][variant] = per
        print(f"{variant:<8} 1c={per['1']:>9.0f}  4c={per['4']:>9.0f}  "
              f"median-eff={per['efficiency']}")
    (REPO / "BENCH" / "docsink_scaling.json").write_text(json.dumps(res, indent=1))
    print("-> BENCH/docsink_scaling.json")


if __name__ == "__main__":
    main()
