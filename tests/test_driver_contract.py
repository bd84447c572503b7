"""Replay of the driver's correctness gate: every catalog query vs DuckDB.

Mirrors the driver protocol — run the Spark plan and the oracle SQL on the
same parquet tables, sort columns by name, compare row multisets — at
sf0.001 so regressions surface before the per-round driver check at sf0.01.
"""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

from crawler_spark.plans.queries import CATALOG

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _canon(value):
    if isinstance(value, float):
        return round(value, 9)
    if hasattr(value, "isoformat"):
        return value.isoformat()[:26]
    if hasattr(value, "item") and not isinstance(value, (str, bytes)):
        try:
            return _canon(value.item())
        except Exception:
            return value
    return value


def _rows(columns, records):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in records)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    fn, sql = CATALOG[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    assert sql is not None, f"{name} has no oracle"
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    got = _rows(spark_cols, spark_rows)
    want = _rows(duck_cols, duck_rows)
    assert len(got) == len(want), f"{name}: row counts {len(got)} vs {len(want)}"
    assert got == want, f"{name}: value mismatch (first diff: "\
        f"{next((a, b) for a, b in zip(got, want) if a != b) if got and want else 'empty'})"


def test_catalog_is_nonempty_where_expected(spark, sf_dir):
    # dedup queries must find the planted duplicates, not vacuous empties
    for name in ("dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_ngram_jaccard"):
        fn, _ = CATALOG[name]
        assert fn(spark, sf_dir).count() > 0, f"{name} found no planted duplicates"
