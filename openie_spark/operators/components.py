"""Canonicalization: connected components on DataFrames (OP-40..44).

Iterative large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) — the published O(log n)-round algorithm
the north star names.  GraphX has no Python API and GraphFrames is not
installable here; more importantly this formulation is pure DataFrame ops
(groupBy-min + join + union), so Catalyst/AQE handle partial aggregation and
skew, and it scales to the 10^12-node posture with nothing but shuffles.

Round shape (all edges kept canonically src<dst between rounds, OP-40):
  large-star: connect every strictly-larger neighbor of u to
              m(u) = min(Γ(u) ∪ {u})
  small-star: connect every neighbor ≤ u (and u itself) to m(u)
Convergence when the edge multiset stops changing (checked by count +
xor-style aggregate hash — one cheap action per round).  Each round ends in
localCheckpoint(eager) to truncate lineage (SURVEY.md §4.2-E) — without it
plan analysis time doubles every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage

MAX_ROUNDS = 50


def canonical_edges(edges: DataFrame) -> DataFrame:
    """OP-40: undirect + dedup; self-loops kept (they pin isolated nodes
    into the vertex universe) but normalized."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def _neighbors(edges: DataFrame) -> DataFrame:
    """Both orientations: (u, v) for every undirected edge."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    return fwd.unionByName(rev)


def _with_min(nbrs: DataFrame) -> DataFrame:
    """m(u) = min over Γ(u) ∪ {u} — groupBy-min (map-side partial agg) then
    join back on u."""
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", F.col("u")).alias("m"))
    return nbrs.join(mins, "u")


def large_star(edges: DataFrame) -> DataFrame:
    n = _with_min(_neighbors(edges))
    return (
        n.where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .unionByName(n.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def small_star(edges: DataFrame) -> DataFrame:
    n = _with_min(_neighbors(edges))
    return (
        n.where(F.col("v") <= F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .unionByName(n.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def _edge_digest(edges: DataFrame) -> tuple:
    # decimal sum: exact and overflow-proof under ANSI mode (Spark 4 default)
    row = edges.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(edges: DataFrame) -> DataFrame:
    """edges(src,dst) → assignments(id, rep) with rep = min(component).

    OP-43: driver-side loop, one digest action per round, localCheckpoint to
    truncate lineage.  Isolated nodes must arrive as self-loops."""
    # remember the full vertex universe before dropping self-loops
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    vertices = cut_lineage(vertices, eager=True)

    cur = canonical_edges(edges).where(F.col("src") != F.col("dst"))
    # lazy cut + digest action: the digest aggregate is the FIRST action on
    # the cut dataset, so it materializes the checkpoint blocks AND returns
    # the convergence digest in ONE job — eager+digest costs two jobs per
    # round, and at vocab-bounded edge counts the loop is pure fixed
    # overhead (measured ~35% of canonicalize wall)
    cur = cut_lineage(cur)
    digest = _edge_digest(cur)
    for _ in range(MAX_ROUNDS):
        nxt = cut_lineage(small_star(large_star(cur)))
        nd = _edge_digest(nxt)
        cur = nxt
        if nd == digest:
            break
        digest = nd
    else:  # pragma: no cover
        raise RuntimeError(f"connected components did not converge in {MAX_ROUNDS} rounds")

    # after convergence every edge is (rep, member) with rep = min(component);
    # canonical form is src=min, so rep = src side
    assign = cur.select(F.col("dst").alias("id"), F.col("src").alias("rep"))
    # nodes that are themselves representatives (or isolated) map to self
    return (
        vertices.join(assign, "id", "left")
        .select("id", F.coalesce("rep", F.col("id")).alias("rep"))
    )
