"""URL-seen set operators: Bloom pre-filter, exact anti-join, ref-count.

The reference's ``ids`` table keeps one row per (file_url, extracted id) with
duplicates by design: the reference count ``COUNT(*) GROUP BY id`` decides
first-add (count==1) and last-remove (count==0) — reference
``code/core/db.py:116-124`` (table), ``db.py:278-282`` (ref-count),
``db.py:237-240`` (added/removed diffs, J3/J4), used at
``code/core/worker.py:215-272``.

Scale design (north_rule): the seen set at 10^10 URLs dominates the join
cost. We keep it partitioned by ``host_hash`` (bucket layout → partition
pruning: an epoch only reads seen-set buckets whose hosts are being crawled)
and pre-filter the *incoming* side with a Bloom filter built from the current
seen-set ids, so the exact ``left_anti`` join only shuffles candidate rows
that *might* be duplicates plus Bloom false positives. Exactness is
preserved: the Bloom only short-circuits definite-new rows; everything else
goes through the exact anti-join (SURVEY.md §4 custom piece #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ID_KEY = ["file_url", "user_id", "id"]


def bloom_supported(spark) -> bool:
    """Spark ≥3.5 ships ``bloom_filter_agg``/``might_contain`` as SQL fns."""
    try:
        spark.sql("SELECT might_contain(bloom_filter_agg(xxhash64('x')), xxhash64('x'))").collect()
        return True
    except Exception:
        return False


def split_by_bloom(
    incoming: DataFrame,
    seen: DataFrame,
    key: str = "id",
    expected_items: int | None = None,
    fpp_bits: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) split of ``incoming`` by a Bloom filter
    aggregated over ``seen[key]``.

    ``definitely_new`` rows skip the expensive anti-join shuffle entirely;
    ``maybe_seen`` rows (a small fraction at steady state: true duplicates +
    ~fpp of new) continue into the exact check. Falls back to
    (incoming, empty) when the Bloom functions are unavailable.
    """
    spark = incoming.sparkSession
    if not bloom_supported(spark):
        return incoming, incoming.limit(0)

    n = expected_items or 1_000_000
    bits = fpp_bits or max(8 * n, 1 << 20)
    bloom_row = seen.select(
        F.expr(f"bloom_filter_agg(xxhash64({key}), cast({n} as long), cast({bits} as long))").alias("bf")
    )
    # single binary blob → broadcast joined (scalar) onto incoming;
    # empty seen set aggregates to NULL → coalesce to "no hit"
    probed = incoming.join(F.broadcast(bloom_row))
    hit = F.coalesce(F.expr(f"might_contain(bf, xxhash64({key}))"), F.lit(False))
    return (
        probed.filter(~hit).drop("bf"),
        probed.filter(hit).drop("bf"),
    )


def diff_ids(extracted: DataFrame, existing: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(added, removed) id rows for the files being (re)processed.

    J3/J4 of SURVEY.md §2.3 — set difference per (file_url, user_id, id),
    exactly the reference's per-file diff (db.py:237-240) done set-wise for
    the whole epoch batch.
    """
    added = extracted.join(existing, _ID_KEY, "left_anti")
    removed = existing.join(extracted, _ID_KEY, "left_anti")
    return added, removed


def anti_join_new_ids(
    extracted: DataFrame,
    seen: DataFrame,
    use_bloom: bool = True,
    expected_items: int | None = None,
) -> DataFrame:
    """Rows of ``extracted`` whose (file_url, user_id, id) is not in ``seen``,
    with the Bloom pre-filter in front of the exact anti-join."""
    if not use_bloom:
        return extracted.join(seen, _ID_KEY, "left_anti")
    fresh, maybe = split_by_bloom(extracted, seen, key="id", expected_items=expected_items)
    checked = maybe.join(seen, _ID_KEY, "left_anti")
    return fresh.unionByName(checked)


def ref_counts(seen: DataFrame) -> DataFrame:
    """Reference counts per (id, user_id) — A1 (db.py:278-282) as one hash agg."""
    return seen.groupBy("id", "user_id").agg(F.count(F.lit(1)).alias("ref_count"))


def first_occurrences(added: DataFrame, seen_before: DataFrame) -> DataFrame:
    """Ids whose insertion takes the ref-count 0 → ≥1 this epoch.

    Reference semantics: an id is indexed when its post-insert count is 1
    (worker.py:216-218). Processing per-file serially, the *first* file to
    insert an id wins; set-wise we reproduce that by keeping ids absent from
    ``seen_before`` and picking the representative row with the smallest
    (queued_at, file_url) — the FIFO tiebreak of SURVEY.md §2.9.
    """
    new_ids = added.join(seen_before, ["id", "user_id"], "left_anti")
    best = F.struct("queued_at", "file_url").alias("rank_key")
    ranked = new_ids.withColumn("rank_key", best)
    winner = ranked.groupBy("id", "user_id").agg(F.min("rank_key").alias("win_key"))
    return (
        ranked.join(winner, ["id", "user_id"])
        .filter(F.col("rank_key") == F.col("win_key"))
        .drop("rank_key", "win_key")
        # a single file can list the same id twice at different positions;
        # keep the first position (reference set() collapses them — U1)
        .dropDuplicates(["id", "user_id"])
    )


def orphaned_ids(removed: DataFrame, seen_after: DataFrame) -> DataFrame:
    """(id, user_id) whose last reference was removed this epoch (count→0),
    i.e. vector-index delete candidates (worker.py:262-266)."""
    return (
        removed.select("id", "user_id").distinct()
        .join(seen_after.select("id", "user_id").distinct(), ["id", "user_id"], "left_anti")
    )
