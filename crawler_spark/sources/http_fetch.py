"""Production HTTP fetch kernel — the real-network variant of S1.

The sandbox engine resolves fetches by joining the frontier against the
``pages`` table (deterministic, no network). A real deployment swaps that
join for this Arrow-batched ``mapInPandas`` kernel with identical output
columns, so nothing downstream changes (reference fetch semantics:
``code/core/worker.py:103-111`` — ``requests.get(url, timeout=30)``,
status/content-length logged, non-2xx → error).

Scale notes:

* one transport (connection pool) per *task*, created lazily via the
  injectable ``transport_factory`` — no per-row session setup, and tests
  inject a fake transport (no network in this container);
* the kernel is pure map-side: fetches run where the frontier partition
  lives (host-hash partitioning upstream means a task's URLs share hosts,
  so keep-alive connections are actually reused);
* politeness is enforced *before* this operator by the budget window
  (``operators/politeness.py``) — the kernel never sees more URLs per host
  per epoch than the crawl-delay budget allows.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_TIMEOUT = 30.0  # reference worker.py:106

#: output schema — the fetch-join stand-in's columns plus explicit status
FETCHED_SCHEMA = (
    "file_url string, user_id string, site_url string, queued_at timestamp, "
    "html binary, status_code int, fetch_error string"
)

#: transport contract: url -> (status_code:int, body:bytes|None, error:str|None)
Transport = Callable[[str], tuple[int, bytes | None, str | None]]


def requests_transport(timeout: float = DEFAULT_TIMEOUT) -> Transport:
    """Real-network transport over ``requests`` (reference worker.py:106).

    Imported lazily — the sandbox has no network, so this factory is only
    ever called on a deployed cluster.
    """
    import requests  # noqa: PLC0415 - deliberate lazy import

    session = requests.Session()

    def get(url: str) -> tuple[int, bytes | None, str | None]:
        try:
            resp = session.get(url, timeout=timeout)
        except requests.RequestException as e:  # DNS/timeout/conn errors
            return 0, None, f"{type(e).__name__}: {e}"
        if resp.status_code != 200:
            return resp.status_code, None, f"HTTP {resp.status_code}"
        return resp.status_code, resp.content, None

    return get


def make_fetch_kernel(transport_factory: Callable[[], Transport]):
    """``mapInPandas`` kernel factory: frontier job rows → fetched rows.

    Input columns: ``file_url, user_id, site_url, queued_at``; output is
    :data:`FETCHED_SCHEMA`. The transport is created once per task and
    reused across every batch the task processes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport: Transport | None = None
        for pdf in batches:
            if transport is None:
                transport = transport_factory()
            status, body, err = [], [], []
            for url in pdf["file_url"]:
                s, b, e = transport(url)
                status.append(s)
                body.append(b)
                err.append(e)
            out = pdf[["file_url", "user_id", "site_url", "queued_at"]].copy()
            out["html"] = body
            out["status_code"] = pd.array(status, dtype="int32")
            out["fetch_error"] = err
            yield out

    return kernel


def fetch_pages(
    jobs: DataFrame,
    transport_factory: Callable[[], Transport] | None = None,
) -> DataFrame:
    """Fetch the job rows' URLs over HTTP; returns :data:`FETCHED_SCHEMA`.

    Drop-in replacement for the engine's fetch-join: rows with a non-null
    ``html`` are the ``ok`` set, null-``html`` rows carry ``status_code`` +
    ``fetch_error`` for the metrics/processing_errors sinks.
    """
    factory = transport_factory or requests_transport
    kernel = make_fetch_kernel(factory)
    return (
        jobs.select("file_url", "user_id", "site_url", "queued_at")
        .mapInPandas(kernel, schema=FETCHED_SCHEMA)
    )
