"""Deterministic maximal independent set (iterative graph family:
components / pagerank / bfs / kcore / mis).

Luby's parallel MIS (FOCS 1985 — public knowledge) with FIXED hash
priorities instead of per-round randomness: each round, every alive node
whose priority is a strict local minimum among its alive neighbors joins
the set; it and its neighbors leave the graph.  Fixed priorities make the
result a pure function of the input (engine-portable, rerun-stable) at
the cost of the re-randomization in Luby's analysis — with a 60-bit hash
the expected round count on real graphs is still O(log n), and the
operator is round-bounded like kcore: nodes still alive at the bound are
simply NOT in the set (the result stays independent and deterministic,
maximality holds whenever the graph resolves within ``rounds`` — gated
in tests by running at R and R+3 and asserting equality).

KG-construction use: conflict-free keeper/leader selection — e.g. pick a
set of near-duplicate-cluster representatives no two of which are
directly linked, or schedule non-conflicting merge operations.

Priority = the engine-portable 60-bit md5 hash of the node id (the
md5-lockstep family), so the DuckDB oracle replays every round.  Hash
ties between NEIGHBORS stall both nodes (neither is a strict minimum);
at 60 bits that is a ~n²/2⁶⁰ event, and the semantics stay deterministic
either way — the tied pair just falls out of the set.

Plan shape per round: one min-aggregation over the alive adjacency
(map-side combinable) + semi/anti joins on the node id; the alive set
only shrinks.  Lineage cut per round; early exit on empty, riding the
same count action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60
from openie_spark.functions.lineage import cut_lineage
from openie_spark.operators.kcore import undirect

MAX_PRIORITY = (1 << 63) - 1


def maximal_independent_set(edges: DataFrame, rounds: int = 16) -> DataFrame:
    """edges(src, dst) (any orientation; self-loops = isolated-node
    markers, they always enter the set) → (node) rows of the selected
    independent set."""
    und = cut_lineage(undirect(edges), eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # priority materialized ONCE with the alive set (the DuckDB oracle's
    # `pri` table) — the loop never re-evaluates md5 over the adjacency
    alive = cut_lineage(
        nodes.withColumn("p", portable_hash60(F.col("node").cast("string"))),
        eager=True,
    )
    n_alive = alive.count()
    spark = edges.sparkSession
    mis = spark.createDataFrame([], "node bigint")

    for _ in range(rounds):
        if n_alive == 0:
            break
        # adjacency restricted to alive nodes, carrying the dst priority
        adj = und.join(
            alive.select(F.col("node").alias("src")), "src", "left_semi"
        ).join(
            alive.select(F.col("node").alias("dst"), F.col("p").alias("dst_p")),
            "dst",
        )
        min_nbr = adj.groupBy("src").agg(F.min("dst_p").alias("min_nbr_p"))
        minima = (
            alive.join(min_nbr, alive.node == min_nbr.src, "left")
            .where(F.col("p") < F.coalesce(F.col("min_nbr_p"), F.lit(MAX_PRIORITY)))
            .select("node", "p")
        )
        mis = mis.unionByName(minima.select("node"))
        dead_nbrs = adj.join(
            minima.select(F.col("node").alias("src")), "src", "left_semi"
        ).select(F.col("dst").alias("node"))
        dead = minima.select("node").unionByName(dead_nbrs).distinct()
        alive = cut_lineage(alive.join(dead, "node", "left_anti"), eager=True)
        mis = cut_lineage(mis, eager=True)
        n_alive = alive.count()

    return mis.distinct()
