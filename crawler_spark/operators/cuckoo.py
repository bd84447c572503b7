"""Partitioned cuckoo-filter URL-seen pre-filter — the deletion-capable
twin of the Bloom path in ``operators/seen.py``.

The north rule names a "Bloom/cuckoo-filter URL-seen set" explicitly: the
Bloom blob is the append-only default, but its stale bits are forever — a
bucket that churns (site deletions J8, removed ids J4, re-crawl diffs)
accumulates false positives until the blob is rebuilt. A cuckoo filter
(Fan et al., CoNLX 2014 — "Cuckoo Filter: Practically Better Than Bloom")
stores displaceable 16-bit fingerprints in 4-slot buckets and supports
O(1) *deletion*, so the filter tracks the live seen set exactly through
churn with a stable ~0.012% false-positive rate (b=4, 16-bit fp).

Same seam contract as the Bloom (drop-in at the epoch loop's prefilter
seam):

* one blob per ``host_hash`` bucket, built/updated where the data lives
  (``applyInPandas`` / cogrouped — the blob never replicates per row);
* probe yields ``(definitely_new, maybe_seen)`` with **zero false
  negatives** — ``maybe_seen`` continues to the exact anti-join, so the
  final seen set stays exact regardless of filter state;
* a bucket with no blob (or whose blob overflowed) defaults to
  ``maybe_seen`` — the exact check absorbs it, mirroring
  ``split_by_bloom_blobs``'s blob-less rule.

Multiset semantics make deletion safe: every insert adds one fingerprint
copy and every delete removes one, and the engine only deletes rows that
were previously inserted (``removed ⊆ seen``), so a delete can never
erase the last witness of a *different* live key — two keys colliding on
(bucket, fingerprint) hold two copies. That precondition requires the
blobs to have witnessed every insert: the engine pins the filter kind in
store metadata (``seen_filter_kind``) and DROPS blob tables whose
recorded provenance differs from the current config (rows added under
``use_bloom=False`` or the other filter kind would otherwise be missing
from the blobs — see ``CrawlEngine.__init__``).

Capacity: tables are powers of two (the partial-key alternate bucket
``b2 = b1 XOR h(fp)`` must stay in range), sized with growth headroom at
first contact. An insert that still fails after ``_MAX_KICKS``
displacements marks the blob OVERFLOWED (table column set to NULL): the
probe then routes the bucket to the exact check, and the next epoch that
*touches* the bucket rebuilds the blob from its seen rows (the engine's
reseed path — ``crawl.py`` gates it on driver-side parquet footer
null-counts over the touched blob files, so epochs with zero overflow pay
nothing). An overflowed bucket in a never-again-touched partition keeps
its NULL blob — harmless: the exact check owns it. Same
"rare extra pass, never wrong" posture as the Bloom's lossless doubling
(which cuckoo tables cannot do blindly: bucket indices depend on the full
hash, which fingerprints alone don't retain).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from crawler_spark.operators.seen import _composite, _H1_KEY, _H2_KEY, _ID_KEY

_SLOTS = 4            # slots per bucket (b=4: 95%+ load before overflow)
_MAX_KICKS = 500      # displacement budget before declaring overflow
_HEADROOM = 4         # fresh blob sized for 4x its first batch (bloom parity)
_FP_MIX = np.uint64(0x5BD1E995)  # fp -> alt-bucket offset mix (odd constant)

CUCKOO_SCHEMA = StructType([
    StructField("host_hash", IntegerType(), True),
    StructField("table", BinaryType(), True),   # uint16[n_buckets * 4], LE
    StructField("n_buckets", LongType(), True),
    StructField("n_items", LongType(), True),
])


def _hashes(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(index_hash, fingerprint) per key — same deterministic SipHash pair
    as the Bloom path; fingerprints are 16-bit nonzero (0 marks empty)."""
    h1 = pd.util.hash_pandas_object(keys, index=False, hash_key=_H1_KEY).to_numpy(np.uint64)
    h2 = pd.util.hash_pandas_object(keys, index=False, hash_key=_H2_KEY).to_numpy(np.uint64)
    fp = (h2 & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    return h1, fp


def _alt(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: self-inverse XOR form (power-of-2 n)."""
    mask = np.uint64(n_buckets - 1)
    off = (fp.astype(np.uint64) * _FP_MIX) & mask
    return (bucket.astype(np.uint64) ^ off).astype(np.int64)


def _pow2_buckets(n_items: int) -> int:
    need = max(64, int(n_items * _HEADROOM / 3))  # ~75% load at headroom cap
    return 1 << int(need - 1).bit_length()


def _bulk_place(table: np.ndarray, b1: np.ndarray, fp: np.ndarray) -> bool:
    """Insert all (b1, fp) into ``table`` (n_buckets x 4 uint16, 0=empty).

    Two vectorized rounds (primary bucket, then alternate) place the vast
    majority; the residue goes through the classic per-key kick loop.
    Returns False on overflow (table left partially filled — caller must
    discard it)."""
    n_buckets = table.shape[0]
    pending = np.arange(len(fp))
    cur = b1.astype(np.int64).copy()
    for _round in (0, 1):
        if not len(pending):
            break
        fill = (table != 0).sum(axis=1).astype(np.int64)
        order = np.argsort(cur[pending], kind="stable")
        pend = pending[order]
        buck = cur[pend]
        # rank of each key within its bucket group (groups are contiguous)
        first = np.r_[True, buck[1:] != buck[:-1]]
        grp_start = np.maximum.accumulate(np.where(first, np.arange(len(buck)), 0))
        rank = np.arange(len(buck)) - grp_start
        slot = fill[buck] + rank
        ok = slot < _SLOTS
        table[buck[ok], slot[ok]] = fp[pend[ok]]
        pending = pend[~ok]
        cur[pending] = _alt(b1[pending], fp[pending], n_buckets)
    for i in pending:  # eviction chains for the residue
        b = int(b1[i])
        f = int(fp[i])
        for kick in range(_MAX_KICKS):
            empties = np.flatnonzero(table[b] == 0)
            if len(empties):
                table[b, empties[0]] = f
                break
            victim = kick % _SLOTS
            f, table[b, victim] = int(table[b, victim]), f
            b = int(_alt(np.array([b]), np.array([f], dtype=np.uint16), n_buckets)[0])
        else:
            return False
    return True


def _probe_table(table: np.ndarray, keys: pd.Series) -> np.ndarray:
    n_buckets = table.shape[0]
    h1, fp = _hashes(keys)
    b1 = (h1 % np.uint64(n_buckets)).astype(np.int64)
    b2 = _alt(b1, fp, n_buckets)
    return (
        (table[b1] == fp[:, None]).any(axis=1)
        | (table[b2] == fp[:, None]).any(axis=1)
    )


def _delete_from_table(table: np.ndarray, keys: pd.Series) -> None:
    """Remove ONE fingerprint copy per key (keys were previously inserted)."""
    n_buckets = table.shape[0]
    h1, fp = _hashes(keys)
    b1 = (h1 % np.uint64(n_buckets)).astype(np.int64)
    b2 = _alt(b1, fp, n_buckets)
    for i in range(len(fp)):
        for b in (int(b1[i]), int(b2[i])):
            hit = np.flatnonzero(table[b] == fp[i])
            if len(hit):
                table[b, hit[0]] = 0
                break


def _blob_row(hh: int, table: np.ndarray | None, n_items: int) -> dict:
    return {
        "host_hash": hh,
        "table": None if table is None else table.astype("<u2").tobytes(),
        "n_buckets": 0 if table is None else table.shape[0],
        "n_items": n_items,
    }


def _load_table(blob) -> np.ndarray | None:
    if blob["table"] is None:
        return None
    t = np.frombuffer(blob["table"], dtype="<u2").copy()
    return t.reshape(int(blob["n_buckets"]), _SLOTS)


def build_host_cuckoos(seen: DataFrame) -> DataFrame:
    """One cuckoo blob per ``host_hash`` bucket over the seen-set composite
    key — the deletion-capable counterpart of ``build_host_blooms``."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hh = int(pdf["host_hash"].iloc[0])
        n_buckets = _pow2_buckets(len(pdf))
        table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        h1, fp = _hashes(_composite(pdf))
        ok = _bulk_place(table, (h1 % np.uint64(n_buckets)).astype(np.int64), fp)
        return pd.DataFrame([_blob_row(hh, table if ok else None, len(pdf))])

    return seen.groupBy("host_hash").applyInPandas(build, schema=CUCKOO_SCHEMA)


def split_by_cuckoo_blobs(
    incoming: DataFrame, cuckoos: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(definitely_new, maybe_seen) split — zero false negatives. Buckets
    with no blob or an overflowed (NULL-table) blob route to ``maybe_seen``
    wholesale, falling through to the exact anti-join."""
    out_schema = StructType(
        incoming.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty:
            return left.assign(maybe_seen=True)
        table = _load_table(right.iloc[0])
        if table is None:  # overflowed blob: exact check takes the bucket
            return left.assign(maybe_seen=True)
        return left.assign(maybe_seen=_probe_table(table, _composite(left)))

    flagged = (
        incoming.groupBy("host_hash")
        .cogroup(cuckoos.groupBy("host_hash"))
        .applyInPandas(probe, schema=out_schema)
    )
    return (
        flagged.filter(~F.col("maybe_seen")).drop("maybe_seen"),
        flagged.filter(F.col("maybe_seen")).drop("maybe_seen"),
    )


def updated_cuckoos(
    cuckoos: DataFrame, added: DataFrame, removed: DataFrame | None = None
) -> DataFrame:
    """Fold this epoch's diff into the persisted blobs — O(added + removed)
    hashing per epoch. Deletions actually CLEAR state (the Bloom's
    ``updated_blooms`` can only grow): a churning bucket keeps its
    false-positive rate flat instead of decaying toward all-maybe.

    A bucket whose blob overflows (insert fails after the kick budget) is
    emitted with a NULL table; the probe then routes it to the exact check
    and the engine rebuilds it from the bucket's seen rows at the next
    epoch that touches the bucket (``build_host_cuckoos`` via the reseed
    path in ``crawl.py``'s ``run_epoch``)."""
    diff = added.select(*(["host_hash"] + _ID_KEY)).withColumn("_op", F.lit(1))
    if removed is not None:
        diff = diff.unionByName(
            removed.select(*(["host_hash"] + _ID_KEY)).withColumn("_op", F.lit(-1))
        )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty and right.empty:
            return pd.DataFrame({
                "host_hash": pd.Series([], dtype="int32"),
                "table": pd.Series([], dtype="object"),
                "n_buckets": pd.Series([], dtype="int64"),
                "n_items": pd.Series([], dtype="int64"),
            })
        if left.empty:  # untouched bucket: blob passes through unchanged
            return pd.DataFrame([right.iloc[0].to_dict()])
        hh = int(left["host_hash"].iloc[0])
        adds = left[left["_op"] > 0]
        dels = left[left["_op"] < 0]
        n_add, n_del = len(adds), len(dels)
        if right.empty or right.iloc[0]["table"] is None:
            if not right.empty:
                # overflowed blob: diff rows alone cannot rebuild it — stay
                # overflowed (NULL table) until a full build_host_cuckoos
                n_now = int(right.iloc[0]["n_items"]) + n_add - n_del
                return pd.DataFrame([_blob_row(hh, None, n_now)])
            if n_del:
                # deletions prove this blob-less bucket HAS prior rows the
                # diff doesn't carry — a blob built from adds alone would
                # false-negative them. Leave the bucket blob-less: the
                # probe routes it to the exact check (same rule as the
                # missing-blob probe path).
                return pd.DataFrame({
                    "host_hash": pd.Series([], dtype="int32"),
                    "table": pd.Series([], dtype="object"),
                    "n_buckets": pd.Series([], dtype="int64"),
                    "n_items": pd.Series([], dtype="int64"),
                })
            table = np.zeros((_pow2_buckets(n_add), _SLOTS), dtype=np.uint16)
            n_before = 0
        else:
            blob = right.iloc[0]
            table = _load_table(blob)
            n_before = int(blob["n_items"])
            if (n_before + n_add) > table.shape[0] * _SLOTS * 0.95:
                # would exceed safe load: declare overflow, defer to rebuild
                return pd.DataFrame([_blob_row(hh, None, n_before + n_add - n_del)])
        if n_del:
            _delete_from_table(table, _composite(dels))
        if n_add:
            n_buckets = table.shape[0]
            h1, fp = _hashes(_composite(adds))
            if not _bulk_place(
                table, (h1 % np.uint64(n_buckets)).astype(np.int64), fp
            ):
                return pd.DataFrame([_blob_row(hh, None, n_before + n_add - n_del)])
        return pd.DataFrame([_blob_row(hh, table, n_before + n_add - n_del)])

    return (
        diff.groupBy("host_hash")
        .cogroup(cuckoos.groupBy("host_hash"))
        .applyInPandas(merge, schema=CUCKOO_SCHEMA)
    )


def anti_join_new_ids_cuckoo(
    extracted: DataFrame, seen: DataFrame, cuckoos: DataFrame | None = None
) -> DataFrame:
    """Exact new-id rows with the cuckoo pre-filter in front — the drop-in
    counterpart of ``seen.anti_join_new_ids(use_bloom=True)``."""
    if cuckoos is None:
        cuckoos = build_host_cuckoos(seen)
    fresh, maybe = split_by_cuckoo_blobs(extracted, cuckoos)
    checked = maybe.join(seen.select(*_ID_KEY), _ID_KEY, "left_anti")
    return fresh.unionByName(checked)
