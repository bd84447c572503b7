"""Plain-Python oracle of the crawl semantics (reference algorithm mirror).

Independently recomputes — with dicts and sets, no Spark — what the final
engine state must be for a given pages corpus + seed list, following the
reference control flow (master.py discovery → worker.py per-file processing
with FIFO order). Used by e2e tests to check the distributed engine's fixed
point: URL-seen set, per-file counts, documents (first-occurrence ids with
byte-identical essential text), removals.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from crawler_spark.functions.extract import (
    extract_essential_fields,
    extract_from_bytes,
    join_types,
)
from crawler_spark.functions.sitemap import (
    parse_schema_map_xml,
    schema_maps_from_robots,
)


@dataclass
class OracleState:
    url_seen: set = field(default_factory=set)          # (file_url, user_id, id)
    files: dict = field(default_factory=dict)           # (file_url, user_id) -> {active, n_items, site}
    documents: dict = field(default_factory=dict)       # doc_key -> {url, site, type, essential_text}


def _doc_key(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()[:32]


def discover(pages: dict[str, bytes], site_url: str, user_id: str) -> list[tuple[str, str]]:
    """(schema_map, file_url) candidates for one seed, reference fallback chain."""
    base = f"https://{site_url}"
    robots = pages.get(f"{base}/robots.txt")
    maps = schema_maps_from_robots(robots, base) if robots is not None else []
    if not maps:
        maps = [f"{base}/schema_map.xml"]
    out = []
    for m in maps:
        body = pages.get(m)
        if body is None:
            continue
        for f in parse_schema_map_xml(body, base):
            out.append((m, f))
    return out


def crawl_fixed_point(
    pages: dict[str, bytes],
    seeds: list[tuple[str, str]],
    state: OracleState | None = None,
) -> OracleState:
    """Run the whole crawl to fixed point, file-at-a-time in FIFO
    (queued_at, file_url) order — the reference's observable ordering."""
    st = state or OracleState()

    # discovery + diff (db.update_site_files semantics)
    current: dict[tuple[str, str], tuple[str, str]] = {}
    discovered_sites = set()
    for site_url, user_id in seeds:
        discovered_sites.add((site_url, user_id))
        for schema_map, file_url in discover(pages, site_url, user_id):
            current[(file_url, user_id)] = (schema_map, site_url)

    existing_active = {
        k for k, v in st.files.items() if v["active"]
    }
    added = sorted(k for k in current if k not in existing_active)
    removed = sorted(
        k for k in existing_active
        if k not in current and (st.files[k]["site"], k[1]) in discovered_sites
    )

    # process added/readded files (worker process_file), FIFO by file_url
    for file_url, user_id in added:
        schema_map, site = current[(file_url, user_id)]
        body = pages.get(file_url)
        if body is None:
            st.files[(file_url, user_id)] = {"active": True, "n_items": 0, "site": site, "error": True}
            continue
        ids, objects = extract_from_bytes(body)
        uniq: dict[str, dict] = {}
        for oid, obj in zip(ids, objects):
            uniq.setdefault(oid, obj)  # U1 within-file dedup, first position wins
        prior = {t[2] for t in st.url_seen if t[0] == file_url and t[1] == user_id}
        for oid, obj in uniq.items():
            count_before = sum(1 for t in st.url_seen if t[2] == oid and t[1] == user_id)
            st.url_seen.add((file_url, user_id, oid))
            if count_before == 0:
                tt = obj.get("@type")
                # reference worker.py:221-226: exact match for scalar @type,
                # membership for list — NOT substring on the display string
                is_breadcrumb = tt == "BreadcrumbList" or (
                    isinstance(tt, list) and "BreadcrumbList" in tt)
                if not is_breadcrumb:
                    types = join_types(obj.get("@type"))
                    st.documents[_doc_key(oid)] = {
                        "url": oid, "site": site, "type": types,
                        "content": json.dumps(obj),
                        "essential_text": extract_essential_fields(obj),
                    }
        for gone in prior - set(uniq):
            st.url_seen.discard((file_url, user_id, gone))
            if not any(t[2] == gone and t[1] == user_id for t in st.url_seen):
                st.documents.pop(_doc_key(gone), None)
        st.files[(file_url, user_id)] = {"active": True, "n_items": len(uniq), "site": site}

    # process removed files (worker process_removed_file)
    for file_url, user_id in removed:
        gone_ids = [t[2] for t in st.url_seen if t[0] == file_url and t[1] == user_id]
        for oid in gone_ids:
            st.url_seen.discard((file_url, user_id, oid))
            if not any(t[2] == oid and t[1] == user_id for t in st.url_seen):
                st.documents.pop(_doc_key(oid), None)
        st.files[(file_url, user_id)] = {
            **st.files.get((file_url, user_id), {"site": "?", "n_items": 0}),
            "active": False,
        }
    return st


def pages_dict(rows) -> dict[str, bytes]:
    """Collect a pages DataFrame (small test corpora only) into {url: html}."""
    return {r["url"]: bytes(r["html"]) for r in rows}
