"""Partitioned cuckoo-filter URL-seen pre-filter: exactness + deletion.

Mirrors the Bloom contract suite (``test_seen_bloom.py``) and adds the
capability the Bloom structurally lacks: deletions that actually clear
filter state through churn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_spark.operators.cuckoo import (
    _bulk_place,
    _delete_from_table,
    _hashes,
    _probe_table,
    anti_join_new_ids_cuckoo,
    build_host_cuckoos,
    split_by_cuckoo_blobs,
    updated_cuckoos,
)


def _ids_df(spark, rows):
    return spark.createDataFrame(
        [
            {
                "file_url": f"https://h{h}.com/f{f}.json",
                "user_id": "u1",
                "id": f"https://h{h}.com/f{f}.json#schema-{i}",
                "host_hash": h % 8,
                "queued_at": None,
            }
            for h, f, i in rows
        ],
        "file_url string, user_id string, id string, host_hash int, queued_at timestamp",
    )


_KEY_COLS = ["file_url", "user_id", "id"]


def _keyset(df):
    return {tuple(r) for r in df.select(*_KEY_COLS).collect()}


# ---- pure-kernel tests (no Spark) -----------------------------------

def test_kernel_insert_probe_delete_roundtrip():
    keys = pd.Series([f"k{i}" for i in range(3000)])
    table = np.zeros((2048, 4), dtype=np.uint16)
    h1, fp = _hashes(keys)
    assert _bulk_place(table, (h1 % np.uint64(2048)).astype(np.int64), fp)
    assert _probe_table(table, keys).all(), "inserted key not found"

    # delete every third key: those keys (almost surely) stop matching,
    # every kept key still matches (multiset copies guarantee it exactly)
    dropped = keys[::3].reset_index(drop=True)
    kept = keys[keys.index % 3 != 0].reset_index(drop=True)
    _delete_from_table(table, dropped)
    assert _probe_table(table, kept).all(), "deletion erased a live key"
    # 16-bit fp at ~37% load: expected stale-hit rate ~0.1% — allow slack
    assert _probe_table(table, dropped).mean() < 0.05


def test_kernel_high_load_eviction_chains():
    """Fill to ~90% load: bulk rounds alone cannot place everything, so
    eviction chains must run — and every key must still probe present."""
    n_buckets = 256
    keys = pd.Series([f"dense{i}" for i in range(int(n_buckets * 4 * 0.90))])
    table = np.zeros((n_buckets, 4), dtype=np.uint16)
    h1, fp = _hashes(keys)
    assert _bulk_place(table, (h1 % np.uint64(n_buckets)).astype(np.int64), fp)
    assert _probe_table(table, keys).all()


def test_kernel_overflow_reports_false():
    n_buckets = 8
    keys = pd.Series([f"over{i}" for i in range(n_buckets * 4 + 8)])
    table = np.zeros((n_buckets, 4), dtype=np.uint16)
    h1, fp = _hashes(keys)
    assert not _bulk_place(table, (h1 % np.uint64(n_buckets)).astype(np.int64), fp)


# ---- Spark seam tests ------------------------------------------------

def test_cuckoo_no_false_negatives_and_exact_result(spark):
    seen = _ids_df(spark, [(h, f, i) for h in range(6) for f in range(4) for i in range(30)])
    incoming = _ids_df(
        spark,
        [(h, f, i) for h in range(6) for f in range(4) for i in range(15)]      # dups
        + [(h, 9, i) for h in range(6) for i in range(10)]                      # new files
        + [(77, 0, i) for i in range(10)],                                      # unseen host bucket
    )

    fresh, maybe = split_by_cuckoo_blobs(incoming, build_host_cuckoos(seen))
    assert not (_keyset(fresh) & _keyset(seen)), "false negative"

    got = _keyset(anti_join_new_ids_cuckoo(incoming, seen))
    want = _keyset(incoming.join(seen, _KEY_COLS, "left_anti"))
    assert got == want

    n_dups = incoming.join(seen, _KEY_COLS, "left_semi").count()
    assert maybe.count() >= n_dups
    assert fresh.count() >= 60  # the filter routes most new rows around the join


def test_updated_cuckoos_adds_and_deletes(spark):
    """Fold two epochs of adds plus one of removals; the filter must keep
    every live key matching and actually CLEAR the removed keys (stale-hit
    rate near the fp collision floor, not 100% like a stale Bloom)."""
    epoch1 = _ids_df(spark, [(h, f, i) for h in range(4) for f in range(2) for i in range(20)])
    blobs = build_host_cuckoos(epoch1)

    epoch2_added = _ids_df(spark, [(h, 5, i) for h in range(4) for i in range(15)]
                           + [(9, 0, i) for i in range(10)])  # 9%8=1: new bucket
    blobs2 = updated_cuckoos(blobs, epoch2_added)

    all_seen = epoch1.unionByName(epoch2_added)
    fresh, _ = split_by_cuckoo_blobs(all_seen, blobs2)
    assert fresh.count() == 0, "previously inserted key escaped the blobs"
    n_items = {r["host_hash"]: r["n_items"] for r in blobs2.collect()}
    assert sum(n_items.values()) == all_seen.count()

    # epoch 3: remove file f0 of every host
    removed = _ids_df(spark, [(h, 0, i) for h in range(4) for i in range(20)])
    live = all_seen.join(removed, _KEY_COLS, "left_anti")
    blobs3 = updated_cuckoos(blobs2, epoch2_added.limit(0), removed=removed)

    fresh_live, _ = split_by_cuckoo_blobs(live, blobs3)
    assert fresh_live.count() == 0, "deletion erased a live key"
    # removed keys now mostly probe definitely-new — state actually cleared
    fresh_removed, _ = split_by_cuckoo_blobs(removed, blobs3)
    assert fresh_removed.count() >= int(0.9 * removed.count())
    n_items3 = {r["host_hash"]: r["n_items"] for r in blobs3.collect()}
    assert sum(n_items3.values()) == live.count()


def test_cuckoo_overflow_blob_falls_through_to_exact(spark):
    """A bucket whose blob overflowed (NULL table) must route every
    candidate to the exact anti-join — never declare definitely-new."""
    seen = _ids_df(spark, [(0, 0, i) for i in range(10)])
    blobs = build_host_cuckoos(seen)
    # flood the bucket far past 95% load via incremental update → overflow
    flood = _ids_df(spark, [(0, 1, i) for i in range(5000)])
    blobs2 = updated_cuckoos(blobs, flood)
    blob = blobs2.collect()[0]
    assert blob["table"] is None and blob["n_items"] == 5010

    incoming = _ids_df(spark, [(0, 0, i) for i in range(10)]      # true dups
                       + [(0, 7, i) for i in range(10)])          # new
    fresh, _ = split_by_cuckoo_blobs(incoming, blobs2)
    assert fresh.count() == 0

    got = _keyset(anti_join_new_ids_cuckoo(incoming, seen, cuckoos=blobs2))
    want = _keyset(incoming.join(seen, _KEY_COLS, "left_anti"))
    assert got == want


def test_missing_cuckoo_blob_falls_through_to_exact(spark):
    seen = _ids_df(spark, [(h, f, i) for h in range(4) for f in range(2) for i in range(10)])
    incoming = _ids_df(
        spark,
        [(h, 0, i) for h in range(4) for i in range(5)]
        + [(h, 7, i) for h in range(4) for i in range(5)],
    )
    no_blobs = build_host_cuckoos(seen).limit(0)
    fresh, _ = split_by_cuckoo_blobs(incoming, no_blobs)
    assert fresh.count() == 0

    got = _keyset(anti_join_new_ids_cuckoo(incoming, seen, cuckoos=no_blobs))
    want = _keyset(incoming.join(seen, _KEY_COLS, "left_anti"))
    assert got == want


def test_delete_diff_on_blobless_bucket_stays_blobless(spark):
    """A deletion diff hitting a bucket with NO blob (filter-config churn:
    rows landed under use_bloom=False or the Bloom filter) must NOT
    fabricate a blob from the diff — the bucket's pre-existing rows aren't
    in the diff, and a fresh blob would false-negative them. The bucket
    stays blob-less → probe keeps routing it to the exact check."""
    seen = _ids_df(spark, [(0, 0, i) for i in range(20)])
    no_blobs = build_host_cuckoos(seen).limit(0)
    removed = _ids_df(spark, [(0, 0, i) for i in range(5)])
    blobs = updated_cuckoos(no_blobs, removed.limit(0), removed=removed)
    assert blobs.count() == 0, "blob fabricated from a deletions-only diff"

    live = seen.join(removed, _KEY_COLS, "left_anti")
    fresh, _ = split_by_cuckoo_blobs(live, blobs)
    assert fresh.count() == 0


def test_engine_with_cuckoo_filter_end_to_end(spark, tmp_path):
    """The cuckoo-configured engine must land the IDENTICAL seen set as the
    Bloom default (the filter only routes rows around the exact check),
    persist its blobs per bucket, and — the cuckoo's raison d'être — fold
    a site hard-delete's removals OUT of the blobs, clearing filter state
    where the Bloom keeps stale bits."""
    from crawler_spark.crawl import CrawlConfig, CrawlEngine
    from crawler_spark.sources.synth import corpus_pages_df, seeds_df, site_host
    from crawler_spark.sources.tables import SnapshotStore

    pages = corpus_pages_df(spark, 6, 2, items_per_chunk=4)

    def run(filter_kind: str, root):
        engine = CrawlEngine(
            spark, SnapshotStore(root), pages,
            CrawlConfig(num_partitions=8, salt_buckets=4,
                        seen_filter=filter_kind))
        engine.bootstrap(seeds_df(spark, 6))
        engine.run()
        return engine

    eng_c = run("cuckoo", tmp_path / "cuckoo")
    eng_b = run("bloom", tmp_path / "bloom")

    key_rows = lambda e: {tuple(r) for r in e.url_seen()
                          .select("file_url", "user_id", "id").collect()}
    assert key_rows(eng_c) == key_rows(eng_b)
    assert eng_c.url_seen().count() == 6 * 2 * 4
    assert eng_c.store.exists("cuckoos")
    assert not eng_c.store.exists("blooms")

    n_items = sum(r["n_items"] for r in
                  eng_c.store.read(spark, "cuckoos").collect())
    assert n_items == 6 * 2 * 4

    # hard-delete one site: blobs must shrink with the seen set
    victim = site_host(0)
    epoch = eng_c.store.read_manifest()["epoch"] + 1
    eng_c.delete_site(victim, "test:user001", epoch)
    assert eng_c.url_seen().count() == 5 * 2 * 4
    n_items_after = sum(r["n_items"] for r in
                        eng_c.store.read(spark, "cuckoos").collect())
    assert n_items_after == 5 * 2 * 4

    # and the filter still never lies: re-crawling everything re-adds only
    # the deleted site's ids (exactness through the pruned blobs)
    from crawler_spark.operators.cuckoo import split_by_cuckoo_blobs
    live = eng_c.url_seen()
    fresh, _ = split_by_cuckoo_blobs(
        live, eng_c.store.read(spark, "cuckoos"))
    assert fresh.count() == 0, "live key escaped the pruned blobs"


def test_seen_filter_config_validated_at_construction():
    """ADVICE r4: a typo'd seen_filter must fail at config time with the
    accepted values, not as a bare KeyError mid-crawl."""
    import pytest

    from crawler_spark.crawl import CrawlConfig

    with pytest.raises(ValueError, match="bloom.*cuckoo"):
        CrawlConfig(seen_filter="Cuckoo")
    with pytest.raises(ValueError, match="seen_filter"):
        CrawlConfig(seen_filter="bloom ")


def test_filter_provenance_mismatch_drops_blobs(spark, tmp_path):
    """ADVICE r4 deletion-safety: blobs are only sound for the filter kind
    they were maintained under. Opening the store with a different
    ``seen_filter`` must drop the mismatched blob tables (they reseed
    lazily) and re-pin the recorded kind."""
    from crawler_spark.crawl import CrawlConfig, CrawlEngine
    from crawler_spark.sources.synth import corpus_pages_df, seeds_df
    from crawler_spark.sources.tables import SnapshotStore

    pages = corpus_pages_df(spark, 4, 2, items_per_chunk=3)
    store = SnapshotStore(tmp_path / "state")
    eng = CrawlEngine(spark, store, pages,
                      CrawlConfig(num_partitions=8, salt_buckets=4,
                                  seen_filter="cuckoo"))
    eng.bootstrap(seeds_df(spark, 4))
    eng.run()
    assert store.exists("cuckoos")
    assert store.get_meta("seen_filter_kind") == "cuckoos"
    seen_before = {tuple(r) for r in eng.url_seen()
                   .select("file_url", "user_id", "id").collect()}

    # reopening under the SAME kind keeps the blobs
    CrawlEngine(spark, store, pages,
                CrawlConfig(num_partitions=8, salt_buckets=4,
                            seen_filter="cuckoo"))
    assert store.exists("cuckoos")

    # reopening under the Bloom default invalidates the cuckoo blobs
    eng_b = CrawlEngine(spark, store, pages,
                        CrawlConfig(num_partitions=8, salt_buckets=4))
    assert not store.exists("cuckoos")
    assert store.get_meta("seen_filter_kind") == "blooms"
    # the seen set itself is untouched, and the engine still answers
    # exactly through the blob-less probe path
    seen_after = {tuple(r) for r in eng_b.url_seen()
                  .select("file_url", "user_id", "id").collect()}
    assert seen_after == seen_before


import pytest as _pytest


@_pytest.mark.parametrize("content_changed", [False, True])
def test_overflowed_blob_reseeds_on_next_touched_epoch(
    spark, tmp_path, content_changed
):
    """An overflowed (NULL-table) blob must be rebuilt from the bucket's
    seen rows by the next epoch that touches the bucket — both when that
    epoch carries id diffs (widened filter write set) and when the
    re-crawl is unchanged (reseed-only persist)."""
    from pyspark.sql import functions as F

    from crawler_spark.crawl import CrawlConfig, CrawlEngine
    from crawler_spark.sources.synth import (
        chunk_url,
        corpus_pages_df,
        seeds_df,
        site_host,
    )
    from crawler_spark.sources.tables import SnapshotStore

    n_sites, chunks, items = 6, 2, 4
    pages = corpus_pages_df(spark, n_sites, chunks, items_per_chunk=items)
    cfg = CrawlConfig(num_partitions=8, salt_buckets=4, seen_filter="cuckoo")
    store = SnapshotStore(tmp_path / "state")
    engine = CrawlEngine(spark, store, pages, cfg)
    engine.bootstrap(seeds_df(spark, n_sites))
    engine.run()

    bucket = spark.createDataFrame([(site_host(0),)], "h string").select(
        F.pmod(F.hash("h"), F.lit(cfg.num_partitions)).alias("b")
    ).first()["b"]

    # simulate an overflow: NULL out that bucket's blob (the marker
    # updated_cuckoos emits when the kick budget is exhausted)
    blobs = store.read(spark, "cuckoos")
    row = blobs.filter(F.col("host_hash") == bucket).first()
    assert row is not None and row["table"] is not None
    nulled = spark.createDataFrame(
        [{"host_hash": int(bucket), "table": None,
          "n_buckets": int(row["n_buckets"]), "n_items": int(row["n_items"])}],
        blobs.schema)
    epoch = store.read_manifest()["epoch"] + 1
    store.commit(epoch, {"cuckoos": store.replace_buckets(
        nulled, "cuckoos", [int(bucket)])})
    assert store.buckets_with_nulls("cuckoos", "table") == [int(bucket)]

    # next epoch touches the bucket: manual re-add of site 0's files
    pages_b = pages
    if content_changed:
        pages_b = pages.withColumn(
            "html",
            F.when(
                F.col("url") == chunk_url(0, 0),
                F.encode(F.regexp_replace(
                    F.decode(F.col("html"), "utf-8"),
                    "#schema-", "#schemaX-"), "utf-8"),
            ).otherwise(F.col("html")))
    eng_b = CrawlEngine(spark, store, pages_b, cfg)
    readd = spark.createDataFrame([
        {"site_url": site_host(0), "user_id": "test:user001",
         "file_url": chunk_url(0, c), "schema_map": "manual"}
        for c in range(chunks)
    ])
    eng_b.add_manual_files(readd, store.read_manifest()["epoch"] + 1)
    eng_b.run()

    # the blob is whole again and covers the bucket's live rows exactly
    assert store.buckets_with_nulls("cuckoos", "table") == []
    reblob = store.read(spark, "cuckoos").filter(
        F.col("host_hash") == bucket).first()
    assert reblob["table"] is not None
    bucket_rows = eng_b.url_seen().filter(F.col("host_hash") == bucket)
    assert int(reblob["n_items"]) == bucket_rows.count()
    fresh, _ = split_by_cuckoo_blobs(
        eng_b.url_seen(), store.read(spark, "cuckoos"))
    assert fresh.count() == 0, "live key escaped the reseeded blobs"
