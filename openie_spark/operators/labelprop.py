"""Synchronous label propagation (community detection) on DataFrames —
deterministic integer-priority formulation (Raghavan et al. 2007, frozen
to the engine's oracle discipline).

Semantics (the frozen spec; the DuckDB oracle in registry.py mirrors it):
every node starts labeled with its own id; each synchronous round a node
adopts the label with the highest vote among its neighbors INCLUDING
ITSELF (the propagation graph is the undirected closure plus a self-loop
per node), ties broken toward the SMALLEST label.  Vote + tiebreak are
fused into one integer priority ``count * PRI_SCALE - label`` so the
argmax is unique — classic synchronous LPA oscillates on bipartite
structures and breaks ties randomly; this formulation is bit-reproducible
across engines, parallelism levels, and runs, which is what the driver's
value hash requires.  ``PRI_SCALE`` must exceed every node id (asserted).

Plan shape per round: edges ⋈ labels (equi-join on the node id) →
groupBy(dst, label) count → groupBy(dst) max_by — two map-side-combinable
aggregations, both shuffling on the node id, no driver-side state beyond
the loop counter.  Lineage is cut per round exactly like the PageRank/CC
loops.  At the 10^12-edge posture the per-(node,label) vote table is
bounded by the edge count, never by label cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage

# One home for the spec constants: the registry query AND its DuckDB
# oracle interpolate these — never re-spell them.
LABEL_PROP_ITERS = 4
PRI_SCALE = 100_000_000


def propagation_graph(edges: DataFrame) -> DataFrame:
    """Undirected closure of (src, dst) plus a self-loop for every node —
    the voting neighborhood of the frozen LPA spec (self-vote means a
    node with no other neighbors keeps its label forever)."""
    return (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .unionByName(edges.select(F.col("src"), F.col("src").alias("dst")))
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("dst").alias("dst")))
        .distinct()
    )


def label_propagation(edges: DataFrame, iters: int = LABEL_PROP_ITERS) -> DataFrame:
    """edges(src, dst) undirected-as-given → (id, label) after ``iters``
    synchronous deterministic LPA rounds over ``propagation_graph``.
    Requires every node id in [0, PRI_SCALE) so the fused priority cannot
    collide across labels (checked lazily via the priority formula — ids
    are fixture-bounded; callers with larger universes must raise
    PRI_SCALE and the oracle constant together)."""
    und = propagation_graph(edges)
    und = cut_lineage(und, eager=True)
    labels = und.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(iters):
        votes = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("nid"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            votes.select(
                F.col("nid").alias("id"),
                "label",
                (F.col("cnt") * F.lit(PRI_SCALE) - F.col("label")).alias("pri"),
            )
            .groupBy("id")
            .agg(F.max_by("label", "pri").alias("label"))
        )
        labels = cut_lineage(labels)
    return labels
