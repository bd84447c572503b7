"""URL canonicalization, host extraction and hashing.

Fidelity targets (reference semantics, reimplemented — not copied):

* site-URL normalization: strip scheme, strip a leading ``www.``, strip
  trailing slashes (reference ``code/core/db.py:13-34``). Must be
  byte-identical — it is the canonical-URL invariant of the whole engine.
* RFC-3986 relative resolution for robots/sitemap URLs (reference uses
  ``urllib.parse.urljoin`` at ``code/core/master.py:60,77,85,104``).
* vector-doc key: ``sha256(url).hexdigest()[:32]`` (reference
  ``code/core/vector_db.py:245-247``) — expressed as a built-in Spark
  expression (``substring(sha2(url,256),1,32)``), JVM-side.
* partition key: murmur3(host) — Spark's built-in ``hash()`` IS murmur3-32,
  so the partitioner needs no Python at all.

Scale note: normalization/host extraction run over every frontier row each
epoch, so the wrappers are Arrow-batched pandas UDFs operating on
``pandas.Series`` with vectorized ``.str`` ops where possible.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCHEME_RE = re.compile(r"^https?://")
_WWW_RE = re.compile(r"^www\.")


# ---------------------------------------------------------------------------
# pure-Python cores
# ---------------------------------------------------------------------------

def normalize_site_url(site_url: str | None) -> str | None:
    """Canonical site key: no scheme, no leading ``www.``, no trailing ``/``.

    Byte-compatible with the reference normalizer (``db.py:13-34``):
    ``https://www.imdb.com`` → ``imdb.com``; empty/None pass through.
    """
    if not site_url:
        return site_url
    stripped = _SCHEME_RE.sub("", site_url)
    stripped = _WWW_RE.sub("", stripped)
    return stripped.rstrip("/")


def host_of(url: str | None) -> str:
    """Registrable host of a URL; tolerant of scheme-less input."""
    if not url:
        return ""
    candidate = url if "://" in url else f"http://{url}"
    return urlparse(candidate).netloc.lower()


def absolutize(base: str, maybe_relative: str) -> str:
    """RFC-3986 resolution, identical to ``urllib.parse.urljoin``."""
    return urljoin(base, maybe_relative)


# ---------------------------------------------------------------------------
# vectorized wrappers
# ---------------------------------------------------------------------------

@pandas_udf(StringType())
def normalize_site_url_udf(urls: pd.Series) -> pd.Series:
    # Vectorized: three .str passes over the whole Arrow batch.
    out = urls.str.replace(_SCHEME_RE, "", regex=True)
    out = out.str.replace(_WWW_RE, "", regex=True)
    out = out.str.rstrip("/")
    # reference passes falsy values through untouched
    return out.where(~(urls.isna() | (urls == "")), urls)


@pandas_udf(StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(host_of, na_action="ignore").fillna("")


@pandas_udf(StringType())
def urljoin_udf(bases: pd.Series, rels: pd.Series) -> pd.Series:
    return pd.Series(
        [urljoin(b, r) if isinstance(b, str) and isinstance(r, str) else None
         for b, r in zip(bases, rels)],
        dtype="object",
    )


def normalize_site_url_expr(col: Column) -> Column:
    """Pure-SQL twin of the normalizer: JVM-side, codegen-friendly.

    Used in hot paths where the input is guaranteed non-empty; the pandas UDF
    above is the byte-fidelity reference for edge cases.
    """
    c = F.regexp_replace(col, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    return F.regexp_replace(c, r"/+$", "")


def doc_key_expr(url_col: Column) -> Column:
    """``sha256(url)[:32]`` vector-index key, as a built-in expression."""
    return F.substring(F.sha2(url_col, 256), 1, 32)


def doc_bucket_expr(id_url_col: Column, num_buckets: int) -> Column:
    """Bucket of a vector document = host bucket of its own ``@id`` URL.

    The documents table is bucket-versioned on this (see
    ``SnapshotStore.replace_buckets``). Host-of-id — NOT a hash of the doc
    key — gives the layout write locality: an epoch's new docs and orphan
    deletes both belong to the hosts being crawled, so the epoch rewrites a
    few host buckets instead of scattering one row into every bucket of the
    table (which would degenerate bucket-replace into a full rewrite).
    """
    return host_hash_expr(host_from_url_expr(id_url_col), num_buckets)


def host_hash_expr(host_col: Column, num_partitions: int) -> Column:
    """murmur3(host) mod P — the frontier partition key (north_rule).

    ``F.hash`` is murmur3-32 on the JVM; ``pmod`` keeps it non-negative.
    """
    return F.pmod(F.hash(host_col), F.lit(num_partitions))


def host_from_url_expr(url_col: Column) -> Column:
    """JVM-side host extraction via ``parse_url`` (no Python).

    Tolerates scheme-less URLs by prepending ``http://`` when absent,
    mirroring :func:`host_of`.
    """
    with_scheme = F.when(
        url_col.contains("://"), url_col
    ).otherwise(F.concat(F.lit("http://"), url_col))
    return F.lower(F.parse_url(with_scheme, F.lit("HOST")))
