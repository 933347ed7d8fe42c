"""HITS hubs & authorities on DataFrames — exact-integer, normalization-free
formulation (Kleinberg 1999, frozen to the engine's oracle discipline).

Why no normalization: classic HITS L2-normalizes each round, which is
float arithmetic — join-order-dependent accumulation, never
hash-comparable across engines (the same reason PageRank here uses
integer mass, pagerank.py).  This formulation keeps the raw integer
recurrence: every node starts with hub = SEED; each round
``auth(v) = Σ hub(u) over in-edges u→v`` then
``hub(u) = Σ auth(v) over out-edges u→v`` — pure int64 sums, exact and
order-independent in both Spark and DuckDB.  Relative ranking per round
is identical to normalized HITS (normalization is a positive scalar).
Values grow like (d_in·d_out)^iters, so iters must keep
SEED · maxdeg^(2·iters) < 2^63 — the registry caps iters at 4 over the
fixture (max in-degree 5 → ≤ 6.25e8, 10 orders of magnitude of headroom);
callers on denser graphs lower SEED or iters.

Plan shape per round: two (edges ⋈ scores → groupBy · sum) passes, both
equi-joins + map-side-combinable sums shuffling on the node id; lineage
cut per round like the other iterative loops.  Nodes with no in-edges
hold auth 0, no out-edges hold hub 0 (they drop out of the recurrence and
re-enter as COALESCE 0 at the end — frozen, mirrored by the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage

HITS_ITERS = 4
HITS_SEED = 1_000_000


def hits_scores(
    edges: DataFrame, iters: int = HITS_ITERS, seed: int = HITS_SEED
) -> DataFrame:
    """edges(src, dst) directed → (id, hub, auth) after ``iters`` exact
    integer HITS rounds (auth first, then hub, per round — the classic
    update order)."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (auth is undefined at round 0)")
    e = edges.select("src", "dst").distinct()
    e = cut_lineage(e, eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = cut_lineage(nodes, eager=True)
    hub = nodes.withColumn("hub", F.lit(int(seed)).cast("long"))
    auth = None
    for _ in range(iters):
        auth = (
            e.join(hub, e.src == hub.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = cut_lineage(auth)
        hub = (
            e.join(auth, e.dst == auth.id)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = cut_lineage(hub)
    out = (
        nodes.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
        )
    )
    return out
