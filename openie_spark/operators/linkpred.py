"""Common-neighbor / Jaccard link prediction over an undirected graph.

The classic KG-completion primitive (Liben-Nowell & Kleinberg, CIKM 2003 —
public knowledge): score non-adjacent node pairs by neighborhood overlap,
the baseline every embedding-based link predictor is measured against.

Scale shape (100 TB posture).  Candidate pairs come from the wedge join
(u—w—v for a shared neighbor w), which enumerates C(deg(w), 2) pairs per
center — the same hub-skew bomb as triangle counting, but orientation does
NOT apply here (we need every wedge, not one per triangle).  The standard
industrial mitigation is a **center-degree cap**: wedge centers with
deg > max_center_degree are skipped.  A 10^6-degree hub would alone emit
~5·10^11 pairs while contributing near-zero per-pair evidence (its
Adamic-Adar weight 1/log(deg) ≈ 0.07); capping bounds per-center fan-out
at C(cap, 2) and makes the join linear in m·cap.  The cap is part of the
operator's declared semantics (`cn` counts only capped centers) and the
DuckDB oracle applies the same constant, so the result stays bit-exact.

Scores are EXACT INTEGERS (the engine-portability rule for iterative /
hash-compared ops): `cn` is a count; `jaccard_micro` =
1e6·cn div (deg(u)+deg(v)−cn) with full (uncapped) degrees — integral
division, identical in Spark (`div`) and DuckDB (`//`) for non-negative
operands.

Everything is plain equi-joins + one groupBy: distinct adjacency (one
shuffle), degree agg (map-side combinable), self-join on the center key,
count agg on the pair key, left-anti vs the edge set, two degree joins.
No Python, no explode over unbounded arrays (adjacency stays ROW-shaped,
never collected into per-node neighbor lists — the list form OOMs on hubs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CENTER_DEGREE = 64
MIN_COMMON = 1


def _adjacency(edges: DataFrame) -> DataFrame:
    """edges(src,dst) → distinct undirected (node, nbr), self-loops dropped."""
    fwd = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    rev = edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    return fwd.unionByName(rev).where(F.col("node") != F.col("nbr")).distinct()


def linkpred_scores(
    edges: DataFrame,
    max_center_degree: int = MAX_CENTER_DEGREE,
    min_common: int = MIN_COMMON,
) -> DataFrame:
    """edges(src, dst) → (a, b, cn, jaccard_micro) for non-adjacent pairs
    a < b with at least `min_common` shared (capped-degree) neighbors."""
    adj = _adjacency(edges)
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))

    centers = adj.join(
        deg.where(F.col("deg") <= max_center_degree).select("node"),
        "node",
        "left_semi",
    )
    x = centers.select(F.col("node").alias("w"), F.col("nbr").alias("a"))
    y = centers.select(F.col("node").alias("w"), F.col("nbr").alias("b"))
    pairs = (
        x.join(y, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
        .where(F.col("cn") >= min_common)
    )

    und = adj.where(F.col("node") < F.col("nbr")).select(
        F.col("node").alias("a"), F.col("nbr").alias("b")
    )
    cand = pairs.join(und, ["a", "b"], "left_anti")

    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.expr("CAST(1000000 * cn AS BIGINT) div (da + db - cn)").alias(
                "jaccard_micro"
            ),
        )
    )
