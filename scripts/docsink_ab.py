"""A/B the documents-sink cost drivers at local[1]: parquet codec + stages.

The 1-vs-4-core profile shows the documents sink is the largest single wall
item of a crawl epoch (25-44 s of a ~60-83 s single-core run at bench
scale). This isolates its stages on a synthetic 188k-row pre-embed frame:

  embed-only        Arrow round-trip + stub embed, no sink
  write-snappy      full sink write, parquet snappy (current default)
  write-uncompressed  no codec — embedding bytes are incompressible,
                      content json is not; measures the codec pass
  write-zstd        r3-verdict suggestion; expected LOSS on the embedding
                    column (random bytes), possible win on text columns

Variants run interleaved, 2 reps, medians printed — same-window comparison.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "1"))
ROWS = int(os.environ.get("ROWS", "188000"))


def main() -> None:
    from pyspark.sql import functions as F

    from bench import bench_tmp_root
    from crawler_spark.functions.embed import embed_binary_udf
    from crawler_spark.session import build_session

    tmp = tempfile.mkdtemp(prefix="docsink_ab_", dir=bench_tmp_root())
    spark = build_session(app_name="docsink_ab", cores=CPUS,
                          extra_conf={"spark.local.dir": tmp})
    spark.sparkContext.setLogLevel("ERROR")

    # ~same shape as the real sink input: id/url/site/type/content/text
    pre = spark.range(ROWS).select(
        F.pmod(F.col("id"), F.lit(32)).cast("int").alias("bucket"),
        F.sha2(F.col("id").cast("string"), 256).alias("id"),
        F.concat(F.lit("https://site.example.com/chunk"),
                 F.col("id").cast("string")).alias("url"),
        F.lit("site.example.com").alias("site"),
        F.lit("Recipe").alias("type"),
        F.concat(F.lit('{"@type":"Recipe","name":"stream frontier harvest",'
                       '"description":"copper lantern meadow quartz harbor '
                       'cinder velvet juniper saffron marble"},"idx":'),
                 F.col("id").cast("string"), F.lit("}")).alias("content"),
        F.concat(F.lit("name: Recipe stream frontier, description: copper "
                       "lantern meadow quartz harbor cinder velvet "),
                 F.col("id").cast("string")).alias("essential_text"),
    )
    src = f"{tmp}/pre"
    pre.write.mode("overwrite").parquet(src)
    pre = spark.read.parquet(src)

    def embedded():
        return pre.repartition(64, "bucket", F.pmod(F.hash("id"), F.lit(8))) \
            .withColumn("embedding", embed_binary_udf(F.col("essential_text")))

    i = [0]

    def run(codec: str | None):
        i[0] += 1
        t0 = time.time()
        if codec is None:
            embedded().write.mode("overwrite").format("noop").save()
        else:
            embedded().write.mode("overwrite").option("compression", codec) \
                .parquet(f"{tmp}/out{i[0]}")
        return time.time() - t0

    variants = [("embed-only(noop)", None), ("write-snappy", "snappy"),
                ("write-uncompressed", "uncompressed"), ("write-zstd", "zstd")]
    results: dict[str, list[float]] = {k: [] for k, _ in variants}
    run("snappy")  # warmup (JIT + python workers)
    for _ in range(2):
        for name, codec in variants:
            results[name].append(run(codec))
    import shutil
    for name, durs in results.items():
        srt = sorted(durs)
        print(f"{name:<22} med={srt[len(srt)//2]:6.2f}s  runs={['%.2f' % d for d in durs]}")
    # bytes on disk per codec (one representative output each)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
