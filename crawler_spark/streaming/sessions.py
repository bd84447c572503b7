"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch twin is the catalog query ``sessionize_events``
(``plans/queries.py``): 30-min-gap sessions per user, rolled up to
(user_id, session_seq, n_events, session_start, session_end). This module
computes the same sessions over an unbounded stream with explicit per-key
state — the brief's "custom stateful operator" shape that windowed
aggregation cannot express (session windows have data-driven, per-key
extents).

Semantics: a session CLOSES (and is emitted downstream) when either

* a later event of the same user arrives more than ``gap`` after the
  session's last event (in-data close — emitted in the same micro-batch), or
* the event-time watermark passes ``last_event + gap`` with no new data for
  the key (timeout close — emitted by the state timeout callback).

The open tail session of each user stays in state until one of the above
happens, so on a finite replay the emitted set is the batch twin's rows
minus each user's final (not-yet-closable) session — exactly the subset a
real pipeline could safely act on. State per key is four scalars (seq,
count, start, last). A timeout close does NOT drop the key's state: it
leaves a *tombstone* ``(seq, 0, None, last)`` so the sequence counter
survives quiet periods spanning multiple micro-batches — otherwise the
user's next event would restart at session_seq=1 and emit duplicate
(user_id, session_seq) keys, breaking parity with the batch twin.
Tombstones are pruned by a secondary timeout ``TOMBSTONE_TTL_US`` after the
last event (after which a returning user's numbering restarts — the
documented state/eviction trade). Memory is O(users active within the TTL),
not O(events), and the only shuffle is the groupBy(user_id) exchange.

Arrival-order note: numbering parity with the batch twin holds for in-order
(per-user) arrival. Out-of-order events *within* one micro-batch are sorted
before folding; cross-batch stragglers older than the open session's last
event are counted into the open session (their timestamps cannot reorder
already-closed sessions — the standard watermark trade).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
])

DEFAULT_GAP_US = 30 * 60 * 1_000_000
#: tombstone lifetime: how long a quiet user's session_seq counter is kept
#: after their last event before the key is evicted (and numbering restarts)
TOMBSTONE_TTL_US = 24 * 60 * 60 * 1_000_000


def _to_us(ts: pd.Series) -> pd.Series:
    """Epoch microseconds from a (tz-aware or naive) pandas timestamp col."""
    if ts.dt.tz is not None:
        ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    # normalize to ns explicitly: pandas 2.x series can carry non-ns units
    # (e.g. datetime64[us] off an Arrow path), where a bare int64 cast would
    # silently be 1000x off and corrupt gap detection
    if hasattr(ts.dt, "as_unit"):
        ts = ts.dt.as_unit("ns")
    return ts.astype("int64") // 1_000


def _row(user_id: int, seq: int, n: int, start_us: int, last_us: int) -> dict:
    return {
        "user_id": user_id,
        "session_seq": seq,
        "n_events": n,
        "session_start": pd.Timestamp(start_us, unit="us", tz="UTC"),
        "session_end": pd.Timestamp(last_us, unit="us", tz="UTC"),
    }


def make_sessionizer(gap_us: int = DEFAULT_GAP_US,
                     tombstone_ttl_us: int = TOMBSTONE_TTL_US):
    """Build the per-key fold passed to ``applyInPandasWithState``.

    State encoding: ``n_events == 0`` means "no open session" — either a
    fresh key or a post-timeout tombstone ``(seq, 0, None, last)`` that
    preserves the sequence counter across quiet periods.
    """

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            seq, n, start_us, last_us = state.get
            if n == 0:
                # tombstone reached its TTL: evict the key entirely
                state.remove()
                return
            # close the open session, keep the counter as a tombstone so a
            # quiet period spanning 2+ micro-batches doesn't reset numbering
            state.update((seq, 0, None, last_us))
            state.setTimeoutTimestamp(
                max((last_us + tombstone_ttl_us) // 1_000,
                    state.getCurrentWatermarkMs() + 1))
            yield pd.DataFrame([_row(user_id, seq, n, start_us, last_us)])
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.assign(_us=_to_us(batch["ts"]))
        batch = batch.sort_values(["_us", "event_id"], kind="mergesort")

        seq, n, start_us, last_us = (
            state.get if state.exists else (0, 0, None, None)
        )
        closed: list[dict] = []
        for us in batch["_us"].to_numpy():
            us = int(us)
            if n == 0:
                seq, n, start_us, last_us = seq + 1, 1, us, us
            elif us - last_us > gap_us:
                closed.append(_row(user_id, seq, n, start_us, last_us))
                seq, n, start_us, last_us = seq + 1, 1, us, us
            else:
                n += 1
                last_us = max(last_us, us)

        state.update((seq, n, start_us, last_us))
        # close the open session once the watermark passes last_event + gap;
        # the timestamp must be strictly ahead of the current watermark
        timeout_ms = (last_us + gap_us) // 1_000 + 1
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA])

    return fold


def sessionize_stream(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    watermark: str = "0 seconds",
) -> DataFrame:
    """30-min-gap session rollup over a streaming events DataFrame.

    ``events`` needs (event_id, user_id, ts) with a TZ-aware ``ts``
    (``stream_events_from_dir`` casts NTZ parquet columns). Batch twin:
    catalog ``sessionize_events``.
    """
    src = events.select("event_id", "user_id", "ts")
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
