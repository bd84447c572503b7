"""Stateful streaming heavy hitters via ``applyInPandasWithState``:
sharded SpaceSaving (Metwally, Agrawal & El Abbadi, ICDT 2005).

Batch twins in the catalog: ``cms_heavy_hitters`` (count-min + exact
candidate verify) and ``top_tokens`` (exact). This module answers the same
"which items are hot right now" question over an unbounded stream —
trending query terms, hot URLs, abusive hosts — where the exact groupBy
is impossible (unbounded distinct items) and a count-min alone cannot
enumerate candidates.

Design:

* items are hash-sharded (``shard = crc32(item) % n_shards``) so every
  item lives in exactly ONE shard — per-shard sketches are therefore
  disjoint and the global candidate set is their plain union, no
  cross-shard merge arithmetic. The only shuffle is the groupBy(shard)
  exchange, and state parallelism scales with n_shards.
* each shard keeps a SpaceSaving summary of capacity ``m``: the classic
  guarantees hold PER SHARD — every item with true count > S/m (S = the
  shard's stream length) is in the summary, and each estimate satisfies
  ``true <= est <= true + err`` with ``err <= S/m``. Hashing shards the
  stream ~uniformly, so the effective global threshold is ~N/(n_shards*m)
  with total state O(n_shards * m) — constants, not stream size.
* eviction is DETERMINISTIC: the batch is folded in (ts, item) order and
  the evicted entry is the (count, err, item)-lexicographic minimum, so a
  replay of the same micro-batch sequence yields bit-identical summaries
  (the engine-wide reproducibility discipline).

Emission: every micro-batch yields the shard's full current summary
(update-mode semantics — downstream keeps the latest row per
(shard, item)). State never times out here; production would add a TTL
rotation like the sessionizer's tombstones.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_CAPACITY = 32
DEFAULT_SHARDS = 8

HH_SCHEMA = StructType([
    StructField("shard", IntegerType()),
    StructField("item", StringType()),
    StructField("est_count", LongType()),
    StructField("max_err", LongType()),
    StructField("shard_total", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("items", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
    StructField("errs", ArrayType(LongType())),
    StructField("total", LongType()),
])


def shard_of(item: str, n_shards: int = DEFAULT_SHARDS) -> int:
    """Deterministic shard id — crc32 is stable across processes (unlike
    Python's salted hash) and cheap in the vectorized assign below."""
    return zlib.crc32(item.encode("utf-8")) % n_shards


def _fold_items(summary: dict, items: list, cap: int) -> None:
    """Fold ``items`` (already deterministically ordered) into the
    SpaceSaving ``summary`` {item: [count, err]}."""
    for it in items:
        ent = summary.get(it)
        if ent is not None:
            ent[0] += 1
        elif len(summary) < cap:
            summary[it] = [1, 0]
        else:
            # evict the (count, err, item)-lexicographic minimum — the
            # deterministic tie-break is what makes replays bit-identical
            victim = min(summary, key=lambda k: (summary[k][0], summary[k][1], k))
            vcount = summary[victim][0]
            del summary[victim]
            summary[it] = [vcount + 1, vcount]


def make_heavy_hitter_fold(capacity: int = DEFAULT_CAPACITY):
    """Build the per-shard fold passed to ``applyInPandasWithState``."""

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "item"], kind="mergesort")

        if state.exists:
            items, counts, errs, total = state.get
            summary = {i: [c, e] for i, c, e in zip(items, counts, errs)}
        else:
            summary, total = {}, 0

        _fold_items(summary, batch["item"].tolist(), capacity)
        total += len(batch)

        keys = sorted(summary)  # deterministic state + emission order
        state.update((
            keys,
            [summary[k][0] for k in keys],
            [summary[k][1] for k in keys],
            total,
        ))
        yield pd.DataFrame({
            "shard": [shard] * len(keys),
            "item": keys,
            "est_count": [summary[k][0] for k in keys],
            "max_err": [summary[k][1] for k in keys],
            "shard_total": [total] * len(keys),
        })

    return fold


def heavy_hitters_stream(
    items: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """``items`` is a streaming DataFrame with (ts timestamp, item string);
    returns the update-mode summary stream (HH_SCHEMA)."""
    sharded = items.withColumn(
        "shard", (F.crc32(F.col("item").cast("binary")) % n_shards).cast("int")
    )
    return (
        sharded.groupBy("shard")
        .applyInPandasWithState(
            make_heavy_hitter_fold(capacity),
            outputStructType=HH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
