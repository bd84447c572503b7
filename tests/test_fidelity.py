"""Byte-fidelity parity tests against the reference implementation.

Each test lifts the relevant pure function out of the reference source
(see ``conftest.load_reference_function``) and checks our reimplementation
produces identical output — including on randomized inputs via hypothesis.

Covered invariants (SURVEY.md §2.7, FIXTURES.md golden assertion #4):
* C1 ``normalize_site_url``  (reference code/core/db.py:13-34)
* C4 id/@graph extraction    (reference code/core/worker.py:75-132)
* C6 ``extract_essential_fields`` (reference code/core/vector_db.py:32-123)
* S3 sitemap XML parse       (reference code/core/master.py:33-66)
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.canonical import normalize_site_url
from crawler_spark.functions.extract import (
    extract_essential_fields,
    extract_ids_and_objects,
)
from crawler_spark.functions.sitemap import (
    parse_schema_map_xml,
    schema_maps_from_robots,
)
from tests.conftest import load_reference_function

# --------------------------------------------------------------------------
# C1 normalize_site_url
# --------------------------------------------------------------------------

ref_normalize = load_reference_function("code/core/db.py", "normalize_site_url", {"re": re})

URL_CASES = [
    "https://www.imdb.com",
    "http://example.com",
    "www.site.org",
    "site.com",
    "https://example.com/",
    "https://www.example.com/path/",
    "HTTPS://www.example.com",  # scheme regex is case-sensitive in the reference
    "httpx://weird",
    "",
    None,
    "https://wwwx.example.com",
    "http://www.www.double.com",
    "ftp://www.example.com/",
    "https://example.com//",
]


def test_normalize_known_cases():
    for url in URL_CASES:
        assert normalize_site_url(url) == ref_normalize(url), url


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=60))
def test_normalize_property(url):
    assert normalize_site_url(url) == ref_normalize(url)


# --------------------------------------------------------------------------
# C4 id / @graph extraction
# --------------------------------------------------------------------------

ref_process_array = load_reference_function("code/core/worker.py", "process_json_array")


def ref_extract(payload):
    """Mirror of the reference's extraction *control flow* built on its own
    ``process_json_array`` (worker.py:93-132), used as the parity oracle."""
    if type(payload) is not dict and type(payload) is not list:
        return [], []
    items = [payload] if not isinstance(payload, list) else payload
    ids, objects = ref_process_array(items)
    for obj in items:
        if isinstance(obj, dict) and "@graph" in obj and "@id" not in obj and isinstance(obj["@graph"], list):
            g_ids, g_objs = ref_process_array(obj["@graph"])
            ids.extend(g_ids)
            objects.extend(g_objs)
    return ids, objects


EXTRACT_CASES = [
    {"@id": "a"},
    [{"@id": "a"}, {"no": "id"}, {"@id": "b"}],
    {"@graph": [{"@id": "g1"}, {"@id": "g2"}]},
    {"@id": "outer", "@graph": [{"@id": "inner"}]},  # @graph skipped: container has @id
    {"@graph": {"@id": "not-a-list"}},
    [{"@graph": [{"@id": "g1"}]}, {"@id": "top"}],  # top-level ids come first
    "just a string",
    42,
    [],
    [{"@graph": [{"x": 1}, {"@id": "g"}, "str"]}],
    [[{"@id": "nested-list-ignored"}]],
]


def test_extract_known_cases():
    for payload in EXTRACT_CASES:
        assert extract_ids_and_objects(payload) == ref_extract(payload), payload


json_values = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=8)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.sampled_from(["@id", "@graph", "@type", "name", "x"]),
            children,
            max_size=4,
        ),
    ),
    max_leaves=12,
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(json_values, st.lists(json_values, max_size=6)))
def test_extract_property(payload):
    assert extract_ids_and_objects(payload) == ref_extract(payload)


# --------------------------------------------------------------------------
# C6 extract_essential_fields — THE byte-identical text invariant
# --------------------------------------------------------------------------

ref_essential = load_reference_function(
    "code/core/vector_db.py", "extract_essential_fields", {"json": json}
)

ESSENTIAL_CASES = [
    {},
    {"@type": "Thing", "@id": "u#1", "name": "n", "irrelevant": "dropped"},
    {"@type": "Recipe", "@id": "u#2", "name": "Cake",
     "recipeIngredient": ["flour", "sugar"], "cookTime": "PT30M", "steps": "dropped"},
    {"@type": ["Movie", "CreativeWork"], "director": {"name": "D", "extra": 1},
     "actor": [{"name": "A1"}, {"name": "A2"}, "plain", {"noname": 1},
               {"name": "A5"}, {"name": "A6-dropped"}]},
    {"@type": "TVSeries", "genre": ["drama", "comedy"], "duration": "PT1H"},
    {"@type": "Product", "offers": {"price": 9.99, "availability": "InStock", "url": "x"},
     "aggregateRating": {"ratingValue": 4.5, "ratingCount": 10, "bestRating": 5},
     "brand": {"name": "B"}, "category": "cat"},
    {"@type": "Product", "offers": [{"price": 1}], "aggregateRating": "4.5"},
    {"@type": "NewsArticle", "author": {"name": "Au"}, "publisher": {"name": "P"},
     "datePublished": "2020-01-01", "articleSection": ["s1", "s2"]},
    {"@type": "Article", "author": [{"name": "A"}]},
    {"@type": "Recipe Movie", "genre": "never-reached",
     "recipeIngredient": ["kept"]},  # elif-chain: Recipe wins
    {"@type": [], "name": "empty-type-list"},
    {"@type": "Thing", "name": "x" * 7000},  # triggers minimal fallback
    {"@type": "Thing", "name": "x" * 400, "description": "y" * 7000},
    {"@type": "Thing", "description": "y" * 7000},  # minimal: name missing → ''
    {"name": "no type at all", "text": "t", "summary": "s"},
    {"@type": "Movie", "director": "just a string"},
    {"@type": "Thing", "name": "unicode ✓ ürl", "description": "naïve"},
]


def test_essential_fields_known_cases():
    for obj in ESSENTIAL_CASES:
        assert extract_essential_fields(obj) == ref_essential(obj), obj


schema_objects = st.dictionaries(
    st.sampled_from([
        "@type", "@id", "name", "description", "headline", "text", "abstract",
        "summary", "recipeIngredient", "recipeYield", "totalTime", "cookTime",
        "prepTime", "recipeCategory", "recipeCuisine", "keywords", "genre",
        "datePublished", "director", "actor", "duration", "contentRating",
        "brand", "model", "offers", "aggregateRating", "category", "author",
        "publisher", "articleSection", "other",
    ]),
    st.one_of(
        st.text(max_size=20),
        st.integers(),
        st.lists(st.one_of(st.text(max_size=8),
                           st.dictionaries(st.sampled_from(["name", "v"]),
                                           st.text(max_size=8), max_size=2)),
                 max_size=7),
        st.dictionaries(st.sampled_from(["name", "price", "availability",
                                         "ratingValue", "ratingCount", "v"]),
                        st.one_of(st.text(max_size=8), st.integers()), max_size=4),
    ),
    max_size=8,
)


@settings(max_examples=400, deadline=None)
@given(obj=schema_objects,
       type_tag=st.one_of(
           st.none(),
           st.sampled_from(["Recipe", "Movie", "TVSeries", "Product", "Article",
                            "NewsArticle", "Thing", "RecipeCollection", ""]),
           st.lists(st.sampled_from(["Recipe", "Movie", "Product", "Thing"]), max_size=2)))
def test_essential_fields_property(obj, type_tag):
    if type_tag is not None:
        obj = {**obj, "@type": type_tag}
    else:
        obj.pop("@type", None)
    # name/description must be sliceable in the minimal fallback, as in the
    # reference (str/list); other shapes raise there too — skip those.
    assert extract_essential_fields(obj) == ref_essential(obj)


# --------------------------------------------------------------------------
# S3 sitemap parse
# --------------------------------------------------------------------------

ref_parse_sitemap = load_reference_function(
    "code/core/master.py", "parse_schema_map_xml", {"ET": ET, "urljoin": urljoin}
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
SITEMAP_CASES = [
    f'<urlset {NS}><url contentType="schema.org/Recipe"><loc>https://a/1.json</loc></url></urlset>',
    f'<urlset {NS}><url contentType="Schema.ORG"><loc> /rel/2.json </loc></url>'
    f'<url contentType="text/html"><loc>https://a/skip</loc></url></urlset>',
    '<urlset><url contentType="schema.org"><loc>3.json</loc></url></urlset>',  # no namespace
    '<urlset><url><loc>no-content-type</loc></url></urlset>',
    '<urlset><url contentType="schema.org"></url></urlset>',  # no loc
    f'<urlset {NS}><url contentType="schema.org"><loc></loc></url></urlset>',  # empty loc
    "not xml at all <<<",
    f'<urlset {NS}></urlset>',
]


def test_sitemap_parse_parity():
    base = "https://base.example.com/sub/"
    for xml_doc in SITEMAP_CASES:
        assert parse_schema_map_xml(xml_doc, base) == ref_parse_sitemap(xml_doc, base), xml_doc


def test_robots_directive_scan():
    body = (
        "User-agent: *\n"
        "SchemaMap: /maps/schema_map.xml\n"
        "schemamap: https://cdn.example.com/alt.xml\n"
        "Disallow: /private\n"
        "SCHEMAMAP:   spaced.xml  \n"
        "NotSchemaMap: /no\n"
    )
    assert schema_maps_from_robots(body, "https://ex.com/") == [
        "https://ex.com/maps/schema_map.xml",
        "https://cdn.example.com/alt.xml",
        "https://ex.com/spaced.xml",
    ]
