"""Streaming SpaceSaving heavy hitters: fold-level guarantees + a live
``applyInPandasWithState`` run vs exact counts.

The SpaceSaving contract under test (Metwally et al. 2005), per shard with
capacity m over a shard-stream of length S:

* summary size <= m;
* every item with true count > S/m is present (no false negatives above
  the threshold);
* every estimate satisfies true <= est <= true + err and err <= S/m.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest

from crawler_spark.streaming.heavy_hitters import (
    DEFAULT_SHARDS,
    _fold_items,
    heavy_hitters_stream,
    make_heavy_hitter_fold,
    shard_of,
)


def _zipfish_items(n_ranks: int = 60, unit: int = 600) -> list[str]:
    """Deterministic skewed stream: item t{k} appears unit//k times,
    interleaved round-robin so hot items span the whole stream."""
    remaining = {f"t{k}": unit // k for k in range(1, n_ranks + 1)}
    out = []
    while remaining:
        for k in sorted(remaining, key=lambda s: int(s[1:])):
            out.append(k)
            remaining[k] -= 1
            if not remaining[k]:
                del remaining[k]
    return out


def _check_spacesaving(summary: dict, truth: dict, stream_len: int, cap: int):
    assert len(summary) <= cap
    threshold = stream_len / cap
    for item, n in truth.items():
        if n > threshold:
            assert item in summary, (item, n, threshold)
    for item, (est, err) in summary.items():
        true = truth.get(item, 0)
        assert true <= est <= true + err, (item, true, est, err)
        assert err <= threshold, (item, err, threshold)


def test_fold_spacesaving_invariants():
    items = _zipfish_items()
    truth = pd.Series(items).value_counts().to_dict()
    summary: dict = {}
    cap = 16
    _fold_items(summary, items, cap)
    _check_spacesaving(
        {k: tuple(v) for k, v in summary.items()}, truth, len(items), cap)


def test_fold_is_deterministic_across_batch_splits_of_ties():
    """Same stream folded as one batch and as 3 sequential batches gives
    the same summary — the (count, err, item) eviction tie-break leaves no
    ordering freedom for a replay to diverge on."""
    items = _zipfish_items(40, 200)
    one: dict = {}
    _fold_items(one, items, 8)
    split: dict = {}
    third = len(items) // 3
    for part in (items[:third], items[third:2 * third], items[2 * third:]):
        _fold_items(split, part, 8)
    assert one == split


def test_heavy_hitters_stream_matches_exact(spark, tmp_path):
    """Live availableNow replay over 4 micro-batches: the final per-shard
    summaries must satisfy the SpaceSaving contract against exact pandas
    counts, with shards partitioning the item space disjointly."""
    cap = 16
    items = _zipfish_items()
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            [1_700_000_000_000_000 + i * 1_000_000 for i in range(len(items))],
            unit="us",
        ),
        "item": items,
    })
    src = tmp_path / "hh_src"
    src.mkdir()
    quarter = (len(pdf) + 3) // 4
    for i in range(4):
        pdf.iloc[i * quarter:(i + 1) * quarter].to_parquet(
            str(src / f"part{i:02d}.parquet"), index=False,
            coerce_timestamps="us")
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("ts timestamp, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    query = (
        heavy_hitters_stream(stream, capacity=cap)
        .writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    rows = spark.sql("SELECT * FROM hh_out").collect()
    assert rows

    # latest emission per shard = rows carrying that shard's max total
    latest_total: dict = {}
    for r in rows:
        latest_total[r["shard"]] = max(latest_total.get(r["shard"], 0),
                                       r["shard_total"])
    final = {
        (r["shard"], r["item"]): (r["est_count"], r["max_err"])
        for r in rows if r["shard_total"] == latest_total[r["shard"]]
    }

    truth = pd.Series(items).value_counts().to_dict()
    # shard disjointness: every emitted item sits in its crc32 shard, and
    # shard stream lengths add up to the full stream
    for (sh, item) in final:
        assert sh == shard_of(item, DEFAULT_SHARDS)
    assert sum(latest_total.values()) == len(items)

    for sh in latest_total:
        shard_truth = {i: n for i, n in truth.items()
                       if shard_of(i, DEFAULT_SHARDS) == sh}
        shard_summary = {i: v for (s, i), v in final.items() if s == sh}
        _check_spacesaving(shard_summary, shard_truth, latest_total[sh], cap)


def test_fold_emission_via_fake_state():
    """The applyInPandasWithState fold: first batch creates state and emits
    the summary; a second batch folds ON TOP of restored state (totals
    accumulate, estimates grow monotonically)."""
    from test_multimodal_streaming import _FakeState

    fold = make_heavy_hitter_fold(capacity=4)
    items1 = ["a", "a", "b", "c", "d", "e"]  # overflows capacity 4
    pdf1 = pd.DataFrame({
        "ts": pd.to_datetime([i * 1_000_000 for i in range(len(items1))], unit="us"),
        "item": items1,
        "shard": [3] * len(items1),
    })
    state = _FakeState()
    (out1,) = fold((3,), iter([pdf1]), state)
    assert state.exists and state.get[3] == len(items1)
    assert len(out1) <= 4 and (out1["shard"] == 3).all()
    est1 = dict(zip(out1["item"], out1["est_count"]))
    assert est1["a"] == 2

    items2 = ["a", "f", "f", "f"]
    pdf2 = pd.DataFrame({
        "ts": pd.to_datetime([i * 1_000_000 for i in range(len(items2))], unit="us"),
        "item": items2,
        "shard": [3] * len(items2),
    })
    (out2,) = fold((3,), iter([pdf2]), state)
    assert state.get[3] == len(items1) + len(items2)
    est2 = dict(zip(out2["item"], out2["est_count"]))
    assert est2["a"] == 3
    assert "f" in est2 and est2["f"] >= 3
    assert (out2["shard_total"] == 10).all()
