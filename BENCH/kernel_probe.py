"""Same-window ceiling probe for the crawl's dominant leg.

The scaling pairs' variance driver (BENCH/BASELINE.md, r5 analysis) is
pair-internal asynchrony: the N and 4N arms run ~10 minutes apart and the
host's effective CPU speed (turbo / hypervisor steal) moves between them,
so the ratio mixes engine scaling with landlord weather.  The memcpy probe
gates on *bandwidth shape* but was shown uncorrelated with pair efficiency
(corr −0.10 over 9 gated pairs) — it measures DRAM streaming, not the
mixed compute the crawl actually runs.

This probe times the crawl's real hot kernel instead: the deterministic
embed fill (`stub_embedding_batch` — ~10 uint32 passes + float convert +
L2 normalize, LLC-chunked) plus the pyarrow parquet PLAIN encode of the
packed column, i.e. the same work `replace_buckets_task_write(documents)`
does per row.  It reports rows/sec at 1 process and aggregate rows/sec at
K processes:

- run adjacent to a scaling arm, it records what the window itself allowed
  for the leg that dominates epoch wall (the pool records it as context);
- the K-proc/1-proc ratio is the *ceiling* the host grants ANY engine for
  this leg in this window — a pair whose window ceiling is below the 0.8
  target cannot evidence engine scaling either way.

Run:  python BENCH/kernel_probe.py [K]         (default K=4)
Prints one JSON line {"rows_1p": r1, "rows_kp_agg": rk, "ratio": rk/r1/K…}.
"""

from __future__ import annotations

import io
import json
import multiprocessing as mp
import sys
import time

ROWS = 4096
REPS = 3


def _leg_once(rows: int) -> float:
    """One embed-fill + parquet-encode pass; returns wall seconds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    from crawler_spark.functions.embed import stub_embedding_batch

    texts = [f"probe document text {i} " * 8 for i in range(rows)]
    t0 = time.time()
    mat = np.ascontiguousarray(stub_embedding_batch(texts).astype("<f4"))
    item = mat.shape[1] * 4
    offsets = np.arange(0, (rows + 1) * item, item, dtype=np.int32)
    emb = pa.BinaryArray.from_buffers(
        pa.binary(), rows, [None, pa.py_buffer(offsets), pa.py_buffer(mat)])
    tbl = pa.table({"id": pa.array(range(rows), pa.int64()), "embedding": emb})
    sink = io.BytesIO()
    pq.write_table(tbl, sink, compression="none",
                   use_dictionary=["id"], write_statistics=["id"])
    return time.time() - t0


def _worker(q) -> None:
    best = min(_leg_once(ROWS) for _ in range(REPS))
    q.put(ROWS / best)


def probe(k: int = 4) -> dict:
    # 1-proc rate
    r1 = ROWS / min(_leg_once(ROWS) for _ in range(REPS))
    # k-proc aggregate (fresh processes, simultaneous)
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(k)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    rk = sum(q.get() for _ in ps)
    return {
        "kernel_rows_1p": round(r1, 1),
        "kernel_rows_kp_agg": round(rk, 1),
        "k": k,
        "kernel_ratio": round(rk / r1, 2),
        "kernel_ceiling_eff": round(rk / r1 / k, 3),
    }


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(json.dumps(probe(k)))
