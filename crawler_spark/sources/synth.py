"""Deterministic synthetic web corpus (the ``pages`` table).

Mirrors the reference's mock-data conventions
(``code/tests/mockdata/generate_test_data.py``): each site exposes

* ``robots.txt`` with a ``SchemaMap:`` directive (and a ``Crawl-delay``),
* ``schema_map.xml`` listing JSON chunk files with
  ``contentType="schema.org/..."`` entries,
* ``chunk<N>.json`` files, each a JSON array of schema.org objects with
  synthetic ``@id = {url}#schema-{idx}`` (reference ``generate_test_data.py:
  27-64``; default 400 items/chunk per ``:17``).

Output schema is the authoritative ``input_hint`` shape
``(url, warc_ts, html:binary, text, lang)``.

Generation is **distributed**: one ``spark.range`` over page indices and an
Arrow-batched ``mapInPandas`` that renders bodies on executors — no
driver-side materialization, so the same code generates a 10^10-row corpus
on a cluster. Determinism comes from hashing (site, chunk, item) coordinates;
there is no global RNG state.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_spark.schema import PAGES

ITEMS_PER_CHUNK = 400  # reference CHUNK_SIZE (generate_test_data.py:17)

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

_TYPES = ("Recipe", "Movie", "Product", "NewsArticle", "Thing")
_LANGS = ("en", "en", "en", "hi", "fr", "de", "es")  # skewed toward en
_WORDS = (
    "stream", "frontier", "harvest", "orchard", "copper", "lantern", "meadow",
    "quartz", "harbor", "cinder", "velvet", "juniper", "saffron", "marble",
)


def _h(*parts: object) -> int:
    """Deterministic 64-bit hash of coordinate tuple (no RNG state)."""
    raw = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")


def site_host(site_idx: int) -> str:
    return f"site{site_idx:05d}.example.com"


def site_url(site_idx: int) -> str:
    return f"https://{site_host(site_idx)}"


def chunk_url(site_idx: int, chunk_idx: int) -> str:
    return f"{site_url(site_idx)}/chunk{chunk_idx}.json"


def _sentence(seed: int, n_words: int) -> str:
    return " ".join(_WORDS[_h(seed, i) % len(_WORDS)] for i in range(n_words))


def make_object(site_idx: int, chunk_idx: int, item_idx: int, seed: int = 42) -> dict:
    """One deterministic schema.org object; cycles @types to exercise every
    essential-fields branch."""
    coord = _h(seed, site_idx, chunk_idx, item_idx)
    url = chunk_url(site_idx, chunk_idx)
    obj_type = _TYPES[coord % len(_TYPES)]
    obj: dict = {
        "@type": obj_type,
        "@id": f"{url}#schema-{item_idx}",
        "name": f"{obj_type} {_sentence(coord, 3)} {item_idx}",
        "description": _sentence(coord + 1, 8 + coord % 8),
    }
    # breadcrumb edge cases (exact-element-match semantics, worker.py:221-226):
    # a multi-type list containing BreadcrumbList must be SKIPPED by indexing;
    # the lone type BreadcrumbListItem (substring trap) must be INDEXED.
    tmod = coord % 29
    if tmod == 11:
        obj["@type"] = ["Thing", "BreadcrumbList"]
    elif tmod == 12:
        obj["@type"] = "BreadcrumbListItem"
    if obj_type == "Recipe":
        obj["recipeIngredient"] = [_sentence(coord + i, 2) for i in range(3)]
        obj["cookTime"] = f"PT{10 + coord % 50}M"
    elif obj_type == "Movie":
        obj["director"] = {"name": f"Director {_sentence(coord + 9, 1)}"}
        obj["genre"] = [_TYPES[(coord + i) % 3] for i in range(2)]
    elif obj_type == "Product":
        obj["offers"] = {"price": round((coord % 10000) / 100, 2), "availability": "InStock"}
        obj["brand"] = {"name": _sentence(coord + 3, 1)}
    elif obj_type == "NewsArticle":
        obj["author"] = {"name": f"Author {_sentence(coord + 4, 1)}"}
        obj["datePublished"] = f"2025-{1 + coord % 12:02d}-{1 + coord % 28:02d}"
    return obj


def robots_body(site_idx: int, crawl_delay: float | None = None) -> str:
    lines = ["User-agent: *", "SchemaMap: /schema_map.xml"]
    if crawl_delay is not None:
        lines.append(f"Crawl-delay: {crawl_delay}")
    lines.append("Disallow: /private")
    return "\n".join(lines) + "\n"


def sitemap_body(site_idx: int, chunk_ids: list[int]) -> str:
    entries = "".join(
        f'  <url contentType="schema.org/Thing"><loc>/chunk{c}.json</loc></url>\n'
        for c in chunk_ids
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"{entries}</urlset>\n"
    )


def chunk_body(site_idx: int, chunk_idx: int, items_per_chunk: int, seed: int = 42) -> str:
    objs = [make_object(site_idx, chunk_idx, i, seed) for i in range(items_per_chunk)]
    return json.dumps(objs)


def _page_row(url: str, body: str, ts_offset: int, lang_seed: int) -> dict:
    return {
        "url": url,
        "warc_ts": _BASE_TS + timedelta(seconds=ts_offset),
        "html": body.encode("utf-8"),
        "text": body if not body.lstrip().startswith(("<", "{", "[")) else _sentence(lang_seed, 12),
        "lang": _LANGS[lang_seed % len(_LANGS)],
    }


def corpus_pages_df(
    spark: SparkSession,
    n_sites: int,
    chunks_per_site: int,
    items_per_chunk: int = ITEMS_PER_CHUNK,
    seed: int = 42,
    hot_site_chunks: int | None = None,
    sitemap_chunks: dict[int, list[int]] | None = None,
) -> DataFrame:
    """Distributed deterministic pages table.

    ``hot_site_chunks`` gives site 0 that many chunks instead (hot-host skew
    for salting tests / bench). ``sitemap_chunks`` overrides, per site index,
    which chunk ids the sitemap lists (dynamic add/remove phases).
    """

    def chunks_of(site_idx: int) -> int:
        if hot_site_chunks is not None and site_idx == 0:
            return hot_site_chunks
        return chunks_per_site

    max_chunks = max(chunks_per_site, hot_site_chunks or 0)
    pages_per_site = 2 + max_chunks  # robots + sitemap + dense chunk slots
    total = n_sites * pages_per_site
    listed = sitemap_chunks  # closure capture for executors

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                site_idx, slot = divmod(int(gid), pages_per_site)
                n_chunks = chunks_of(site_idx)
                if slot == 0:
                    delay = 1.0 if _h(seed, site_idx, "delay") % 4 == 0 else None
                    rows.append(_page_row(
                        f"{site_url(site_idx)}/robots.txt",
                        robots_body(site_idx, delay), int(gid), _h(seed, gid)))
                elif slot == 1:
                    chunk_ids = (listed or {}).get(site_idx, list(range(n_chunks)))
                    rows.append(_page_row(
                        f"{site_url(site_idx)}/schema_map.xml",
                        sitemap_body(site_idx, chunk_ids), int(gid), _h(seed, gid)))
                else:
                    chunk_idx = slot - 2
                    if chunk_idx >= n_chunks:
                        continue  # dense-slot padding for non-hot sites
                    rows.append(_page_row(
                        chunk_url(site_idx, chunk_idx),
                        chunk_body(site_idx, chunk_idx, items_per_chunk, seed),
                        int(gid), _h(seed, gid)))
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in PAGES.fields})

    # at least 32 output partitions: the pages table this stands in for is
    # TB-scale with thousands of row groups, so scan-side stages (fetch-join
    # → extract) are never split-starved there; a handful of single-row-group
    # files would cap those stages' parallelism at the file count regardless
    # of cores (parquet splits below row-group granularity do no work)
    parallelism = max(spark.sparkContext.defaultParallelism * 2, 32)
    return (
        spark.range(0, total, numPartitions=parallelism)
        .mapInPandas(render, schema=PAGES)
    )


def seeds_df(spark: SparkSession, n_sites: int, user_id: str = "test:user001") -> DataFrame:
    """Seed list in reference shape (normalized site urls, db.py:86-98)."""
    from crawler_spark.schema import SEEDS

    rows = [
        {"site_url": site_host(i), "user_id": user_id,
         "interval_hours": 24, "last_processed": None, "is_active": True}
        for i in range(n_sites)
    ]
    return spark.createDataFrame(rows, SEEDS)
