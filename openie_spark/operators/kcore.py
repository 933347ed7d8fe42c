"""Round-bounded k-core peeling on DataFrames (iterative graph family:
components / pagerank / bfs / kcore).  k-core = the maximal subgraph where
every node has degree >= k (Seidman 1983); the KG-construction use is
pruning weakly-attested entity neighborhoods before expensive downstream
passes (a node kept by the 2-core has at least two independent
co-mention edges).

Exact semantics (frozen for the oracle): starting from the de-duplicated
undirected edge set (both orientations, self-loops dropped), each ROUND
keeps exactly the edges whose BOTH endpoints have degree >= k in the
current edge set.  ``rounds`` bounds the iteration: full peeling of a
path graph needs O(n) rounds (two endpoints per round), which no
distributed engine should loop for — the bounded form is deterministic,
SQL-expressible (DuckDB recursive CTE whose working table is the alive
edge set; degree subqueries reference the working table), and converges
to the true k-core whenever the graph's peeling depth <= rounds.  The
loop exits early at a fixpoint (edge count unchanged — the count rides
the same action that materializes the round's lineage cut).

Plan shape per round: ONE degree aggregation (map-side combinable) +
two broadcast-or-shuffle semi joins on the node id; the alive set only
shrinks, so per-round cost is monotone non-increasing.  Lineage is cut
per round like every iterative operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage


def undirect(edges: DataFrame) -> DataFrame:
    """Both orientations, self-loops dropped, exact-duplicate edges merged."""
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionByName(
            edges.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )


def kcore_edges(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """edges(src, dst) → the (src, dst) undirected-orientation edge set
    surviving ``rounds`` rounds of k-core peeling (early exit on
    fixpoint)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = cut_lineage(undirect(edges), eager=True)
    n_edges = und.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = und.groupBy("src").agg(F.count("*").alias("d"))
        alive = deg.where(F.col("d") >= k).select(F.col("src").alias("id"))
        nxt = und.join(
            alive, und.src == alive.id, "left_semi"
        ).join(alive, und.dst == alive.id, "left_semi")
        nxt = cut_lineage(nxt, eager=True)
        n_next = nxt.count()
        if n_next == n_edges:
            break
        und, n_edges = nxt, n_next
    return und


def kcore_nodes(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """(id, deg) for every node surviving the round-bounded peel — the
    degree is within the surviving subgraph (the value the next stage's
    pruning policy thresholds on)."""
    kept = kcore_edges(edges, k, rounds)
    return kept.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("deg")
    )
