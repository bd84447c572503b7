"""Write-leg scaling A/B: JVM parquet sink vs task-side pyarrow sink.

Round-4 instrument #2. `scripts/docsink_scaling.py` showed the documents
sink's WRITE leg (shuffle + dynamic-partition parquet write of 6 KB binary
rows, JVM only, no Python) scales 1->4 cores at ~0.44-0.48 on this host even
in windows where the memcpy probe scales ~5x — and the absolute rate
(~120 MB/s/core) is far below tmpfs speed. This script isolates WHY and
measures the candidate fixes:

* ``jvm``      — the current sink shape: repartition(bucket, salt) ->
                 6144-B constant binary -> partitionBy("_b") parquet write
                 (with maxConcurrentOutputFileWriters=16, the session
                 default, so no partition sort).
* ``jvm_mem``  — ``jvm`` with the JVM heap scaled per core (4 g x cores):
                 on a real N->4N cluster each executor brings its own heap,
                 so a fixed 8 g heap at both levels under-models 4N. If
                 efficiency jumps, the 1->4 loss is GC/memory pressure.
* ``paw``      — task-side pyarrow write: the same repartition, then a
                 ``mapInArrow`` kernel builds the 6 KB vectors in numpy and
                 writes per-bucket parquet files itself (pyarrow C++),
                 yielding only (bucket, path, rows) manifest rows. The 6 KB
                 column never crosses Arrow->JVM and never touches the JVM
                 parquet writer.
* ``pawfull``  — ``paw`` but with REAL stub embeddings computed in the same
                 kernel (the fused embed+write documents-sink design):
                 compare against docsink_scaling.json's ``full``.

Each (variant, cores) cell runs REPS times, interleaved across the grid so
a host-window shift hits all cells; medians are reported.

Run:  python scripts/write_leg_ab.py [n_rows] [reps]   (default 300_000, 3)
Output: BENCH/write_leg_ab.json + human table on stdout.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_BUCKETS = 16
CORES = (1, 4)
#: ``noop`` = generation + repartition + 6 KB constant + JVM sum over the
#: bytes, NO write, NO Python — isolates whether the non-scaling term is
#: upstream of the sink. ``shm`` = raw multi-process pyarrow parquet write
#: to /dev/shm, no Spark — the host's write-path scaling ceiling.
VARIANTS = ("noop", "shm", "jvm", "jvm_mem", "paw", "pawfull")


def shm_variant(procs: int, n: int) -> float:
    """Rows/s of ``procs`` bare processes each parquet-writing n/procs
    6 KB-binary rows to /dev/shm via pyarrow — no Spark, no shuffle."""
    import multiprocessing as mp
    import time

    def worker(k: int, q) -> None:
        import os
        import tempfile

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="wl_shm_", dir="/dev/shm")
        try:
            chunk = 8192
            base = np.random.default_rng(7).random(
                (chunk, 1536), dtype=np.float32)  # built once, outside timing
            t0 = time.time()
            done = 0
            widx = 0
            while done < k:
                m = min(chunk, k - done)
                mat = base[:m]
                offs = np.arange(0, (m + 1) * 6144, 6144, dtype=np.int32)
                emb = pa.BinaryArray.from_buffers(
                    pa.binary(), m, [None, pa.py_buffer(offs), pa.py_buffer(mat)])
                ids = pa.array(np.arange(done, done + m, dtype=np.int64))
                tbl = pa.table({"id": ids, "embedding": emb})
                pq.write_table(tbl, f"{d}/part-{widx}.parquet",
                               compression="none")
                widx += 1
                done += m
            q.put(k / (time.time() - t0))
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(n // procs, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return round(sum(q.get() for _ in ps), 1)


def spark_variant(cores: int, variant: str, n: int) -> float:
    if variant == "shm":
        return shm_variant(cores, n)
    code = f"""
import json, os, sys, tempfile, time, shutil, uuid
sys.path.insert(0, {str(REPO)!r})
if "{variant}" == "jvm_mem":
    os.environ["SPARK_DRIVER_MEM"] = f"{{4 * {cores}}}g"
from bench import bench_tmp_root
from crawler_spark.session import build_session
import pyspark.sql.functions as F

root = bench_tmp_root() or tempfile.gettempdir()
local = tempfile.mkdtemp(prefix="wl_local_", dir=root)
out = tempfile.mkdtemp(prefix="wl_out_", dir=root)
spark = build_session(app_name="write_leg_ab", cores={cores},
                      extra_conf={{"spark.local.dir": local}})
spark.sparkContext.setLogLevel("ERROR")
try:
    def make_rows(n_):
        return (spark.range(n_)
            .select(F.col("id"),
                    F.concat(F.lit("synthetic doc text number "),
                             F.col("id").cast("string"),
                             F.lit(" with some padding tokens")).alias("t"),
                    F.pmod(F.hash("id"), F.lit({N_BUCKETS})).alias("bucket"))
            .repartition({N_BUCKETS} * 2, F.col("bucket"),
                         F.pmod(F.hash("id"), F.lit(8))))
    if "{variant}" == "noop":
        def run_once(n_, out_):
            (make_rows(n_).select("bucket", "id", "t",
                     F.lit(bytes(6144)).alias("embedding"))
             .select(F.sum(F.length("embedding")).alias("s")).collect())
    elif "{variant}".startswith("jvm"):
        def run_once(n_, out_):
            (make_rows(n_).select("bucket", "id", "t",
                     F.lit(bytes(6144)).alias("embedding"))
             .withColumn("_b", F.col("bucket")).write.mode("overwrite")
             .partitionBy("_b").option("compression", "uncompressed")
             .parquet(out_ + "/p"))
    else:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.types import (IntegerType, LongType, StringType,
                                       StructField, StructType)

        real = "{variant}" == "pawfull"

        def make_kernel(outdir):
          def kernel(batches):
            from crawler_spark.functions.embed import stub_embedding_batch
            writers = {{}}
            counts = {{}}
            tid = TaskContext.get().partitionId()
            tag = uuid.uuid4().hex[:8]
            for b in batches:
                bkt = b.column("bucket").to_numpy()
                n_ = len(bkt)
                if real:
                    mat = stub_embedding_batch(b.column("t").to_pylist())
                else:
                    mat = np.zeros((n_, 1536), dtype=np.float32)
                mat = np.ascontiguousarray(mat.astype("<f4", copy=False))
                offs = np.arange(0, (n_ + 1) * 6144, 6144, dtype=np.int32)
                emb = pa.BinaryArray.from_buffers(
                    pa.binary(), n_, [None, pa.py_buffer(offs), pa.py_buffer(mat)])
                tbl = pa.table({{"bucket": b.column("bucket"), "id": b.column("id"),
                                "t": b.column("t"), "embedding": emb}})
                for v in np.unique(bkt):
                    part = tbl.filter(pa.compute.equal(tbl.column("bucket"), int(v)))
                    w = writers.get(int(v))
                    if w is None:
                        d = f"{{outdir}}/_b={{int(v)}}"
                        os.makedirs(d, exist_ok=True)
                        path = f"{{d}}/part-{{tid:05d}}-{{tag}}.parquet"
                        w = (pq.ParquetWriter(path, part.schema,
                                              compression="none"), path)
                        writers[int(v)] = w
                        counts[int(v)] = 0
                    w[0].write_table(part)
                    counts[int(v)] += part.num_rows
            man_pa = pa.schema([("bucket", pa.int32()), ("path", pa.string()),
                                ("rows", pa.int64())])
            for v, (w, path) in writers.items():
                w.close()
                yield pa.RecordBatch.from_pylist(
                    [{{"bucket": int(v), "path": path, "rows": counts[v]}}],
                    schema=man_pa)
          return kernel

        man_schema = StructType([StructField("bucket", IntegerType()),
                                 StructField("path", StringType()),
                                 StructField("rows", LongType())])
        def run_once(n_, out_):
            man = make_rows(n_).mapInArrow(
                make_kernel(out_ + "/p"), man_schema).collect()
            assert sum(r.rows for r in man) == n_, man[:3]
    warm = tempfile.mkdtemp(prefix="wl_warm_", dir=root)
    run_once(20_000, warm)  # warmup: codegen + python worker spinup outside timing
    shutil.rmtree(warm, ignore_errors=True)
    t0 = time.time()
    run_once({n}, out)
    dur = time.time() - t0
    print(json.dumps({{"rps": {n} / dur, "dur": dur}}))
finally:
    spark.stop()
    shutil.rmtree(local, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=str(REPO))
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-3000:])
    return round(json.loads(r.stdout.strip().splitlines()[-1])["rps"], 1)


def main() -> None:
    runs: dict[tuple[str, int], list[float]] = {
        (v, c): [] for v in VARIANTS for c in CORES}
    for rep in range(REPS):
        for variant in VARIANTS:
            for cores in CORES:
                rps = spark_variant(cores, variant, N_ROWS)
                runs[(variant, cores)].append(rps)
                print(f"rep{rep} {variant:<8} {cores}c  {rps:>9} rows/s",
                      flush=True)
    res: dict = {"n_rows": N_ROWS, "reps": REPS, "variants": {}}
    for variant in VARIANTS:
        per = {str(c): statistics.median(runs[(variant, c)]) for c in CORES}
        per["all"] = {str(c): runs[(variant, c)] for c in CORES}
        per["efficiency"] = round(per["4"] / (4 * per["1"]), 3)
        res["variants"][variant] = per
        print(f"{variant:<8} 1c={per['1']:>9.0f}  4c={per['4']:>9.0f}  "
              f"median-eff={per['efficiency']}")
    (REPO / "BENCH" / "write_leg_ab.json").write_text(json.dumps(res, indent=1))
    print("-> BENCH/write_leg_ab.json")


if __name__ == "__main__":
    main()
