"""Per-node triangle counting with degree-ordered orientation (Suri &
Vassilvitskii, WWW 2011 — public knowledge).

Triangle counting is the canonical hub-skew bomb: the naive wedge join
enumerates C(deg, 2) two-paths per node, so one 10^6-degree hub alone
yields ~5·10^11 wedge rows.  Orienting every edge from its (degree, id)-
smaller endpoint to the larger one bounds every node's OUT-degree by
~sqrt(m), each triangle is counted exactly once (at its unique
orientation-source), and the wedge join becomes linear-ish in m^1.5 —
the formulation that survives power-law graphs at the 100 TB posture.
All plain equi-joins: Catalyst/AQE shapes apply, and the whole construction
is expressible in ANSI SQL, so the driver oracle hash-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))  # self-loops form no triangles
        .distinct()
    )


def _oriented_edges(und: DataFrame) -> DataFrame:
    """Orient each undirected edge from the (deg, id)-smaller endpoint (u)
    to the larger (v) — a total order, so the orientation is deterministic
    and acyclic."""
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    j = und.join(
        deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """edges(src, dst) (any orientation, dups/self-loops tolerated) →
    (id, n_triangles) for every node in at least one triangle."""
    und = _canonical_undirected(edges)
    e = _oriented_edges(und)
    x = e.select(F.col("u"), F.col("v").alias("v1"))
    y = e.select(F.col("u"), F.col("v").alias("v2"))
    wedges = (
        x.join(y, "u")
        .where(F.col("v1") < F.col("v2"))
        .select("u", F.col("v1").alias("a"), F.col("v2").alias("b"))
    )
    # close the wedge against the canonical undirected edge (a < b holds)
    tri = wedges.join(und, ["a", "b"], "left_semi")
    return (
        tri.select(F.explode(F.array("u", "a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
