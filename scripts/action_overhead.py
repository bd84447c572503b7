"""Micro-measure per-Spark-action fixed cost for the crawl loop's sink shapes.

Times (a) tiny-table parquet writes, (b) scratch materialize+read, (c) an
isEmpty probe, (d) the same plan re-run with a changed epoch literal (codegen
cache miss) vs an identical literal (hit) — at local[1], with and without
the low-overhead committer confs. Drives the round-4 fixed-cost work: the
1-vs-4-core profile shows ~26 s of non-scaling time spread over ~30 actions.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MODE = sys.argv[1] if len(sys.argv) > 1 else "base"


def main() -> None:
    from pyspark.sql import functions as F

    from bench import bench_tmp_root
    from crawler_spark.session import build_session

    extra = {}
    if MODE == "fast":
        extra = {
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
            "spark.sql.parquet.int96RebaseModeInWrite": "CORRECTED",
            "spark.sql.parquet.datetimeRebaseModeInWrite": "CORRECTED",
        }
    tmp = tempfile.mkdtemp(prefix="action_oh_", dir=bench_tmp_root())
    spark = build_session(app_name="action_overhead", cores=1,
                          extra_conf={"spark.local.dir": tmp, **extra})
    spark.sparkContext.setLogLevel("ERROR")

    df_small = spark.range(100).select(
        F.col("id"), F.sha1(F.col("id").cast("string")).alias("url"),
        F.lit("pending").alias("status"))

    def t(label, fn, reps=6):
        durs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            durs.append(time.time() - t0)
        durs = sorted(durs)
        print(f"{label:<46} med={durs[len(durs)//2]*1000:7.0f}ms "
              f"min={durs[0]*1000:7.0f}ms max={durs[-1]*1000:7.0f}ms")

    i = [0]

    def write_small():
        i[0] += 1
        df_small.write.mode("overwrite").parquet(f"{tmp}/w{i[0]}")

    t("tiny write (100 rows, fresh dir)", write_small)

    def write_empty():
        i[0] += 1
        df_small.filter("id < 0").write.mode("overwrite").parquet(f"{tmp}/e{i[0]}")

    t("empty write", write_empty)

    def mat_and_read():
        i[0] += 1
        p = f"{tmp}/m{i[0]}"
        df_small.write.mode("overwrite").parquet(p)
        spark.read.parquet(p).where("status = 'pending'").count()

    t("materialize + read + count", mat_and_read)

    base = df_small.write.mode("overwrite")
    base.parquet(f"{tmp}/probe")
    probe = spark.read.parquet(f"{tmp}/probe")
    t("isEmpty probe on parquet", lambda: probe.isEmpty())
    t("count() on parquet", lambda: probe.count())

    # codegen-cache behavior: same plan shape, changing epoch literal
    def agg_with_epoch(epoch):
        (probe.withColumn("epoch", F.lit(epoch))
         .groupBy("status").agg(F.count("*").alias("n"), F.max("epoch"))
         .collect())

    agg_with_epoch(0)  # warm
    t("agg, SAME epoch literal (cache hit)", lambda: agg_with_epoch(1))
    k = [100]

    def changing():
        k[0] += 1
        agg_with_epoch(k[0])

    t("agg, CHANGING epoch literal (cache miss?)", changing)

    spark.stop()
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
