"""Similarity search over embedding columns: brute-force and LSH-bucketed.

Two paths, same contract (top-k cosine neighbors per query):

* ``brute_force_topk`` — exact: broadcast the (small) query set against the
  candidate table, JVM higher-order dot products, per-query window top-k.
  This is the ground truth and right up to ~10^7 candidates × few queries.
* ``lsh_topk`` — the 10^10-scale path: sign-random-projection LSH buckets
  candidates by a b-bit sketch; each query probes its own bucket plus the
  ``n_probe`` nearest buckets by sketch hamming distance, so the pairwise
  stage touches ~``n_probe / 2^b`` of the corpus. Recall is tunable
  (b, n_probe); exactness is NOT claimed — tests measure recall against the
  brute-force truth.

Projections are deterministic (seeded hash), generated driver-side as a
``b × dim`` float array and broadcast — no RNG state on executors.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x AS double))")


def _norm(col: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate({col}, 0D, (acc, x) -> acc + x * x)"))


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")


def brute_force_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", _norm("cv"))
    scored = (
        F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _projections(dim: int, bits: int, seed: int = 7) -> np.ndarray:
    raw = hashlib.sha256(f"lsh|{seed}|{dim}|{bits}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(raw[:8], "big"))
    return rng.standard_normal((bits, dim))


def _sketch_udf(bits: int, seed: int = 7):
    """Sign-sketch UDF with executor-side plane generation.

    The hyperplanes are derived deterministically from (seed, dim, bits) on
    each executor from the first Arrow batch's vector length — identical on
    every task, and the driver never runs a job to discover ``dim`` (an
    operator that may sit mid-pipeline must not force an extra action).
    """
    from pyspark.sql.functions import pandas_udf

    plane_cache: dict[int, np.ndarray] = {}

    @pandas_udf(LongType())
    def sketch(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())              # (n, dim) per Arrow batch
        dim = mat.shape[1]
        planes = plane_cache.get(dim)
        if planes is None:
            planes = plane_cache.setdefault(dim, _projections(dim, bits, seed))
        signs = mat @ planes.T > 0                   # (n, bits)
        weights = (1 << np.arange(bits)).astype(np.int64)
        return pd.Series(signs @ weights)

    return sketch


def lsh_topk(
    queries: DataFrame, candidates: DataFrame, k: int = 5,
    bits: int = 8, n_probe: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via sign-random-projection bucketing.

    Candidates shuffle once on their bucket id; each query fans out to the
    ``n_probe`` buckets nearest its own sketch (hamming), then the bucketed
    pairwise scoring + window top-k run exactly like brute force but on a
    ~``n_probe/2^bits`` slice of the corpus.
    """
    # dim is discovered executor-side inside the sketch UDF — no driver
    # action; the explicit param remains only for API compatibility
    del dim
    sketch = _sketch_udf(bits)

    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", _norm("cv")).withColumn("bucket", sketch(F.col("cv")))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv")).withColumn("qbucket", sketch(F.col("qv")))

    # probe set: all 2^bits buckets ranked by hamming to the query's sketch
    all_buckets = F.expr(f"sequence(0, {(1 << bits) - 1})")
    probes = (
        q.withColumn("bucket", F.explode(all_buckets))
        .withColumn("ham", F.bit_count(F.expr("qbucket ^ bucket")))
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("ham", "bucket")),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select("query_id", "qv", "qn", "bucket")
    )

    scored = (
        F.broadcast(probes)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def kmeans_bucket_assign(
    emb: DataFrame, k: int = 16, quant: int = 1000,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Data-adaptive IVF buckets: one deterministic Lloyd step of k-means.

    A fixed sign sketch assumes uncorrelated dimensions — on real
    (anisotropic) embeddings whole quadrants can be empty while one bucket
    holds most of the corpus. Learned centroids follow the data instead:

    1. quantize each vector to integer milli-units (``floor(x·quant+0.5)``
       — exact and identical in any engine, the fixed-point discipline all
       cross-engine oracles here use);
    2. seed centroids = the ``k`` vectors with the smallest ``id_col``
       (a distributed ``TakeOrdered`` — O(k) driver bytes at any scale);
    3. assign each vector to its nearest seed by *integer* squared L2
       (broadcast join on k rows, zip_with fold — exact, order-free);
    4. recompute centroids as per-cluster integer sums + counts (exact:
       no float mean, so no summation-order divergence);
    5. re-assign to the nearest updated centroid comparing
       ``Σ(cnt·x − sum)² / cnt²`` — the integer numerator is exact and the
       single double division is IEEE-identical everywhere; ties break on
       cluster id.

    Returns the input columns + ``bucket``. More Lloyd steps = repeat 4-5
    (each is one small exchange over (cluster, dim) cells + a broadcast);
    one step already adapts occupancy to the data, which is what the
    bucket-equi-join pair stage needs. Scale shape: the corpus never
    shuffles — steps 3/5 broadcast k centroid rows, step 4 exchanges only
    k·dim aggregation cells.
    """
    xq = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x AS double) * {quant}"
        " + 0.5d) AS bigint))")
    v = emb.withColumn("_xq", xq)

    # orderBy(id).limit(k) fixes WHICH rows seed; number them by id order
    seeds = (
        v.orderBy(id_col).limit(k)
        .select(F.col(id_col).alias("_sid"), F.col("_xq").alias("_sq"))
        .withColumn("_cl", F.row_number().over(Window.orderBy("_sid")) - 1)
        .select("_cl", "_sq")
    )

    d_int = F.expr(
        "aggregate(zip_with(_xq, _sq, (x, s) -> (x - s) * (x - s)), "
        "0L, (acc, t) -> acc + t)")
    assign1 = (
        v.crossJoin(F.broadcast(seeds))
        .withColumn("_d", d_int)
        .withColumn("_r", F.row_number().over(
            Window.partitionBy(id_col).orderBy("_d", "_cl")))
        .filter(F.col("_r") == 1)
        .select(id_col, "_xq", "_cl")
    )

    cells = (
        assign1.select(id_col, "_cl", F.posexplode("_xq").alias("_dim", "_x"))
        .groupBy("_cl", "_dim")
        .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
    )
    centroids = (
        cells.groupBy("_cl")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(_dim, _s))), "
                   "t -> t._s)").alias("_sum"),
            F.first("_n").alias("_cnt"),
        )
    )

    d2_int = F.expr(
        "aggregate(zip_with(_xq, _sum, (x, s) -> (_cnt * x - s) * (_cnt * x - s)), "
        "0L, (acc, t) -> acc + t)")
    return (
        v.crossJoin(F.broadcast(centroids))
        .withColumn("_d", d2_int.cast("double") / (F.col("_cnt") * F.col("_cnt")).cast("double"))
        .withColumn("_r", F.row_number().over(
            Window.partitionBy(id_col).orderBy("_d", "_cl")))
        .filter(F.col("_r") == 1)
        .select(*emb.columns, F.col("_cl").alias("bucket"))
    )
