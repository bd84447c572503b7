"""Connected components over near-duplicate candidate pairs.

The step after pair generation in every production dedup pipeline: candidate
pairs (from MinHash/SimHash/embedding buckets) form an undirected graph whose
connected components are the duplicate clusters; each cluster keeps one
canonical document (the minimum doc id) and drops the rest.

Algorithm: alternating large-star / small-star label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
the standard shuffle-bounded formulation; also the basis of GraphFrames'
implementation). Each round is two self-contained DataFrame aggregations;
rounds converge in O(log n) iterations on real graphs, and every round's
shuffle is proportional to the CURRENT edge set, which only shrinks. No
driver-side collect of data-sized results — the convergence check is a
single count.

Reference parity note: the reference engine has no clustering step (its
dedup is exact id-level, ``code/core/db.py`` url_seen); this operator is part
of the training-data-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize + dedup an edge list with columns (a, b)."""
    return (
        edges.select("a", "b")
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than the node to the node's minimum
    neighbor (including itself): for each a over the SYMMETRIZED neighbor
    set, m = min(a, min(b)); emit (b, m) for all b > a. Symmetrizing here
    is load-bearing — small-star emits oriented (big, small) edges, and
    large-star over only that orientation silently drops the graph."""
    sym = _sym(edges)
    m = sym.groupBy("a").agg(F.least(F.first("a"), F.min("b")).alias("m"))
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor smaller-or-equal to the node's minimum
    neighbor: orient edges (big, small), then for each big node emit
    (small_i, min_small) for all its smalls plus (big, min_small)."""
    oriented = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
    m = oriented.groupBy("a").agg(F.min("b").alias("m"))
    return (
        oriented.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .unionByName(m.select(F.col("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster candidate pairs into components: returns (doc_id, component)
    where component is the minimum doc id reachable from doc_id.

    ``pairs`` needs two numeric id columns; isolated docs (no pair) are not
    emitted — callers left-join and coalesce to doc_id for a total mapping.
    Each iteration materializes the shrinking edge list to a local checkpoint
    boundary via ``localCheckpoint(eager=True)`` so the lineage (and thus
    re-planning cost) stays flat across rounds — the same pinning trick the
    crawl engine uses for epoch intermediates.
    """
    edges = _sym(pairs.select(F.col(a).alias("a"), F.col(b).alias("b")))
    edges = edges.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # converged when the edge set is a fixed point (star graphs only:
        # every edge already points at its component minimum)
        if nxt.exceptAll(edges).isEmpty() and edges.exceptAll(nxt).isEmpty():
            edges = nxt
            break
        edges = nxt
    # final star graph: every node's neighbor IS the component minimum
    comp = edges.groupBy("a").agg(F.min("b").alias("component"))
    roots = (
        edges.select(F.col("b").alias("a"))
        .distinct()
        .join(edges.select("a"), "a", "left_anti")
        .withColumn("component", F.col("a"))
    )
    return (
        comp.unionByName(roots)
        .select(F.col("a").alias("doc_id"), "component")
    )
