"""Connected-components operator: correctness on known graph shapes."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.components import connected_components
from crawler_spark.session import build_session


@pytest.fixture(scope="module")
def spark():
    return build_session(cores=8)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = connected_components(df).collect()
    return {r["doc_id"]: r["component"] for r in got}


def test_two_components_multi_hop(spark):
    # chain 1-2-3-4 (min 1) and triangle 10-11-12 (min 10); edge direction
    # deliberately mixed — the operator must treat edges as undirected
    comp = _cc(spark, [(2, 1), (2, 3), (4, 3), (11, 10), (12, 11), (10, 12)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges(spark):
    # a 40-node path needs multiple large/small-star rounds (log-diameter)
    comp = _cc(spark, [(i, i + 1) for i in range(40)])
    assert comp == {i: 0 for i in range(41)}


def test_star_and_duplicate_edges(spark):
    comp = _cc(spark, [(5, 9), (9, 5), (5, 7), (5, 8), (7, 9)])
    assert comp == {5: 5, 7: 5, 8: 5, 9: 5}


def test_no_driver_sized_collects(spark):
    # the convergence check must be metadata-only: result stays distributed
    df = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    out = connected_components(df)
    assert out.filter(F.col("component").isin(1, 3)).count() == 4
