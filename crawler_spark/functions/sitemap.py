"""Sitemap (``schema_map.xml``) and robots.txt discovery parsing.

Fidelity targets (reference semantics, reimplemented):

* sitemap parse — reference ``code/core/master.py:33-66``: namespace-tolerant
  ``<urlset><url contentType=...><loc>`` scan; keep a ``<url>`` iff its
  ``contentType`` attribute contains ``schema.org`` (case-insensitive);
  ``urljoin(base, loc.strip())`` absolutization; XML parse errors → empty.
* robots ``schemaMap:`` directive scan — reference ``code/core/master.py:76-101``:
  keep lines whose lowercase form starts with ``schemamap:``; take everything
  after the first ``:``, strip, resolve against the site URL.
* fallback chain — reference ``code/core/master.py:103-127``: robots
  directives → ``<site>/schema_map.xml`` → the site URL itself if it already
  ends with ``schema_map.xml``.

Spark wrappers are scalar pandas UDFs returning ``array<string>`` — one
sitemap/robots body in, N URLs out — consumed with ``explode``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StringType

_SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_schema_map_xml(xml_content: str | bytes | None, base_url: str) -> list[str]:
    """Schema-file URLs listed by a sitemap body (reference master.py:33-66)."""
    if xml_content is None:
        return []
    try:
        root = ET.fromstring(xml_content)
    except ET.ParseError:
        return []

    url_nodes = root.findall(f"{_SITEMAP_NS}url") or root.findall("url")
    found: list[str] = []
    for node in url_nodes:
        if "schema.org" not in node.get("contentType", "").lower():
            continue
        loc = node.find(f"{_SITEMAP_NS}loc")
        if loc is None:
            loc = node.find("loc")
        if loc is not None and loc.text:
            found.append(urljoin(base_url, loc.text.strip()))
    return found


def schema_maps_from_robots(robots_body: str | bytes | None, site_url: str) -> list[str]:
    """``schemaMap:`` directive URLs from a robots.txt body (master.py:81-86)."""
    if robots_body is None:
        return []
    text = robots_body.decode("utf-8") if isinstance(robots_body, (bytes, bytearray)) else robots_body
    maps: list[str] = []
    for line in text.splitlines():
        if line.lower().startswith("schemamap:"):
            maps.append(urljoin(site_url, line.split(":", 1)[1].strip()))
    return maps


def crawl_delay_from_robots(robots_body: str | bytes | None) -> float | None:
    """``Crawl-delay:`` seconds if present (politeness budget input; north_rule
    extension — the reference uses robots only for discovery)."""
    if robots_body is None:
        return None
    text = robots_body.decode("utf-8") if isinstance(robots_body, (bytes, bytearray)) else robots_body
    for line in text.splitlines():
        if line.lower().startswith("crawl-delay:"):
            try:
                return float(line.split(":", 1)[1].strip())
            except ValueError:
                return None
    return None


# ---------------------------------------------------------------------------
# Spark wrappers
# ---------------------------------------------------------------------------

@pandas_udf(ArrayType(StringType()))
def parse_sitemap_udf(bodies: pd.Series, base_urls: pd.Series) -> pd.Series:
    return pd.Series(
        [parse_schema_map_xml(b, base) for b, base in zip(bodies, base_urls)],
        dtype="object",
    )


@pandas_udf(ArrayType(StringType()))
def robots_schema_maps_udf(bodies: pd.Series, site_urls: pd.Series) -> pd.Series:
    return pd.Series(
        [schema_maps_from_robots(b, s) for b, s in zip(bodies, site_urls)],
        dtype="object",
    )


@pandas_udf(DoubleType())
def robots_crawl_delay_udf(bodies: pd.Series) -> pd.Series:
    return pd.Series([crawl_delay_from_robots(b) for b in bodies], dtype="float64")
