"""Partitioned-Bloom URL-seen pre-filter: exactness and effectiveness."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.seen import anti_join_new_ids, split_by_bloom


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


def test_bloom_no_false_negatives_and_exact_result(spark):
    seen = _ids_df(spark, [(h, f, i) for h in range(6) for f in range(4) for i in range(30)])
    # half overlapping, half new (new files + new hosts)
    incoming = _ids_df(
        spark,
        [(h, f, i) for h in range(6) for f in range(4) for i in range(15)]      # dups
        + [(h, 9, i) for h in range(6) for i in range(10)]                      # new files
        + [(77, 0, i) for i in range(10)],                                      # unseen host bucket
    )

    fresh, maybe = split_by_bloom(incoming, seen)
    fresh_keys = {tuple(r) for r in fresh.select("file_url", "user_id", "id").collect()}
    seen_keys = {tuple(r) for r in seen.select("file_url", "user_id", "id").collect()}
    # no false negatives: nothing marked definitely-new is actually seen
    assert not (fresh_keys & seen_keys)

    # end result identical to the exact anti-join
    got = {
        tuple(r)
        for r in anti_join_new_ids(incoming, seen, use_bloom=True)
        .select("file_url", "user_id", "id").collect()
    }
    want = {
        tuple(r)
        for r in incoming.join(seen, ["file_url", "user_id", "id"], "left_anti")
        .select("file_url", "user_id", "id").collect()
    }
    assert got == want

    # effectiveness: every true duplicate lands in maybe_seen, and the Bloom
    # routes the bulk of genuinely-new rows around the exact join
    n_maybe = maybe.count()
    n_dups = incoming.join(seen, ["file_url", "user_id", "id"], "left_semi").count()
    assert n_maybe >= n_dups
    assert fresh.count() >= 60  # most of the 130 new rows skip the join
