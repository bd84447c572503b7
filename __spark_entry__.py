"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship rollup on sf0.001;
``queries()``/``oracle_sql()`` expose the operator catalog from
``crawler_spark.plans.queries`` (one named query per implemented operator
family of SURVEY.md §2 + the training-data pipeline operators), each with a
DuckDB-equivalent oracle SQL string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crawler_spark.plans import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the /api/status-shaped
    3-way left join + multi-distinct rollup (SURVEY.md §2.3 J6 + §2.4 A3)."""
    return _catalog.q_site_status_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ dedup /
    similarity / text-analysis operators). Each callable takes
    (spark, sf_dir) and returns a DataFrame with oracle-matched column names."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every catalog entry."""
    return _catalog.oracle_sql()
