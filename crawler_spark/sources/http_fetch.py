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
* politeness is enforced at TWO grains: the budget window
  (``operators/politeness.py``) caps URLs per host per epoch *before* this
  operator, and the kernel itself spaces same-host requests by the row's
  ``crawl_delay_s`` (robots Crawl-delay, broadcast-joined by the engine)
  so a 60 s epoch with budget 10 cannot burst 10 requests in 2 s. Hosts
  are partition-local (host-hash partitioning upstream), so the
  last-request clock is a tiny per-task dict; the clock and sleeper are
  injectable for deterministic tests.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from urllib.parse import urlsplit

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


def make_fetch_kernel(
    transport_factory: Callable[[], Transport],
    min_delay_s: float = 0.0,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
):
    """``mapInPandas`` kernel factory: frontier job rows → fetched rows.

    Input columns: ``file_url, user_id, site_url, queued_at`` plus an
    optional ``crawl_delay_s`` (robots Crawl-delay per row; absent/null →
    ``min_delay_s``); output is :data:`FETCHED_SCHEMA`. The transport is
    created once per task and reused across every batch the task
    processes. Same-host requests are spaced ≥ the row's delay using a
    per-task last-request clock that survives across batches — the
    within-epoch pacing that the per-epoch budget alone cannot give
    (a budget-10 host would otherwise burst its 10 fetches back to back).
    ``clock``/``sleep`` default to monotonic wall time and are injectable
    so tests assert spacing with a fake clock.
    """
    _clock = clock or time.monotonic
    _sleep = sleep or time.sleep

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport: Transport | None = None
        last_by_host: dict[str, float] = {}
        for pdf in batches:
            if transport is None:
                transport = transport_factory()
            delays = pdf["crawl_delay_s"] if "crawl_delay_s" in pdf.columns else None
            status, body, err = [], [], []
            for i, url in enumerate(pdf["file_url"]):
                delay = min_delay_s
                if delays is not None and not pd.isna(delays.iloc[i]):
                    delay = max(float(delays.iloc[i]), min_delay_s)
                host = urlsplit(url).netloc.lower()
                if delay > 0 and host in last_by_host:
                    wait = last_by_host[host] + delay - _clock()
                    if wait > 0:
                        _sleep(wait)
                s, b, e = transport(url)
                last_by_host[host] = _clock()
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
    min_delay_s: float = 0.0,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> DataFrame:
    """Fetch the job rows' URLs over HTTP; returns :data:`FETCHED_SCHEMA`.

    Drop-in replacement for the engine's fetch-join: rows with a non-null
    ``html`` are the ``ok`` set, null-``html`` rows carry ``status_code`` +
    ``fetch_error`` for the metrics/processing_errors sinks. If ``jobs``
    carries a ``crawl_delay_s`` column the kernel honors it as the same-host
    inter-request spacing.
    """
    factory = transport_factory or requests_transport
    kernel = make_fetch_kernel(factory, min_delay_s, clock, sleep)
    cols = ["file_url", "user_id", "site_url", "queued_at"]
    if "crawl_delay_s" in jobs.columns:
        cols.append("crawl_delay_s")
    return jobs.select(*cols).mapInPandas(kernel, schema=FETCHED_SCHEMA)
