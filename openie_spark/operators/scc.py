"""Strongly connected components on DataFrames (iterative graph family:
components / pagerank / bfs / kcore / mis / walks).

Forward-coloring + backward-collection SCC — the Pregel-style "coloring"
decomposition (Orzan 2004; Slota/Rajamanickam/Madduri "Multistep" IPDPS
2014 — public knowledge), expressed as pure DataFrame ops so Catalyst/AQE
handle partial aggregation and skew:

  per outer round, over the still-active subgraph:
    1. color: propagate min HASH PRIORITY forward to fixpoint —
       color(u) = min priority over {u} ∪ {v : v reaches u}.  Each
       iteration is one groupBy-min (map-side combinable) + one join.
    2. roots: nodes whose own priority equals their color — no smaller-
       priority active node reaches them, so their SCC is "exposed".
    3. collect: from the roots, propagate BACKWARD along edges whose both
       endpoints carry the root's color; everything gathered is exactly
       the root's SCC (it reaches the root inside the color region, and
       the root reaches it by the color's definition).
    4. extract those SCCs (label = min member id — priority-scheme-
       independent), shrink the active set, repeat.

Priorities are the engine-portable 60-bit md5 hash of the node id
(functions/hashing.py — the md5-lockstep family) rather than the raw id:
with raw ids an ascending chain extracts one root per round (O(n) outer
rounds); hashed priorities randomize the extraction order so the expected
outer-round count is O(log n) (the prefix-minima argument, same regime as
mis.py).  The OUTPUT is independent of the priority scheme.

Scale posture (100 TB): identical to the published coloring algorithms —
every step is an equi-join + min-aggregation on the edge relation, the
active set only shrinks, and each inner iteration ends in a lineage cut.
Forward/backward fixpoints cost O(color-region diameter) rounds; real
KG/web SCC diameters are short, and long-diameter pathologies are bounded
by ``max_rounds`` (raises rather than returning a partial answer — unlike
kcore/mis, SCC must assign EVERY vertex or the result is wrong).

The DuckDB oracle (registry ``scc``) is round-free: full recursive
reachability closure on the fixture digraph, scc(u) = MIN(v) over the
mutual-reachability set — exact, so operator and oracle agree bit-for-bit
without replaying the iteration schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60
from openie_spark.functions.lineage import cut_lineage

MAX_PRIORITY = (1 << 63) - 1
MAX_OUTER_ROUNDS = 24
MAX_INNER_ROUNDS = 200


def _fixpoint_min_forward(edges: DataFrame, color: DataFrame) -> DataFrame:
    """Propagate min color along src->dst to fixpoint.

    ``color``: (id, c).  Returns the fixpoint coloring.  One count action
    per iteration (the convergence check rides the changed-row count).
    """
    for _ in range(MAX_INNER_ROUNDS):
        cand = (
            edges.join(
                color.select(F.col("id").alias("src"), F.col("c").alias("sc")), "src"
            )
            .groupBy("dst")
            .agg(F.min("sc").alias("mc"))
        )
        merged = color.join(cand, color.id == cand.dst, "left").select(
            "id",
            F.col("c"),
            F.least(F.col("c"), F.coalesce(F.col("mc"), F.lit(MAX_PRIORITY))).alias(
                "c2"
            ),
        )
        merged = cut_lineage(merged, eager=True)
        changed = merged.where(F.col("c2") < F.col("c")).count()
        color = merged.select("id", F.col("c2").alias("c"))
        if changed == 0:
            return color
    raise RuntimeError("scc: forward coloring did not converge")


def strongly_connected_components(edges: DataFrame) -> DataFrame:
    """edges(src, dst) directed; self-loops = isolated-node markers (they
    pin the node into the vertex universe and form singleton SCCs).
    Returns (id, scc) for EVERY vertex, scc = min member id — a pure
    function of the input edge set."""
    spark = edges.sparkSession
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    active = cut_lineage(
        verts.withColumn("p", portable_hash60(F.col("id").cast("string"))), eager=True
    )
    base_edges = cut_lineage(
        edges.where(F.col("src") != F.col("dst")).select("src", "dst").distinct(),
        eager=True,
    )
    ae = base_edges
    result = spark.createDataFrame([], "id bigint, scc bigint")
    n_active = active.count()

    for _ in range(MAX_OUTER_ROUNDS):
        if n_active == 0:
            return result
        color = _fixpoint_min_forward(ae, active.select("id", F.col("p").alias("c")))
        roots = (
            active.join(color, "id")
            .where(F.col("c") == F.col("p"))
            .select("id", "c")
        )
        # edges both of whose endpoints carry the same color — the only
        # edges backward collection may traverse (stay inside the region)
        ce = (
            ae.join(color.select(F.col("id").alias("src"), F.col("c").alias("sc")), "src")
            .join(color.select(F.col("id").alias("dst"), F.col("c").alias("dc")), "dst")
            .where(F.col("sc") == F.col("dc"))
            .select("src", "dst", F.col("sc").alias("c"))
        )
        ce = cut_lineage(ce, eager=True)
        members = cut_lineage(roots, eager=True)
        for _ in range(MAX_INNER_ROUNDS):
            grown = (
                ce.join(
                    members.select(F.col("id").alias("dst"), F.col("c").alias("mc")),
                    "dst",
                )
                .where(F.col("c") == F.col("mc"))
                .select(F.col("src").alias("id"), "c")
                .distinct()
                .join(members, "id", "left_anti")
            )
            grown = cut_lineage(grown, eager=True)
            n_new = grown.count()
            if n_new == 0:
                break
            members = cut_lineage(members.unionByName(grown), eager=True)
        else:
            raise RuntimeError("scc: backward collection did not converge")
        labels = members.groupBy("c").agg(F.min("id").alias("scc"))
        result = cut_lineage(
            result.unionByName(members.join(labels, "c").select("id", "scc")),
            eager=True,
        )
        active = cut_lineage(
            active.join(members.select("id"), "id", "left_anti"), eager=True
        )
        ae = cut_lineage(
            ae.join(active.select(F.col("id").alias("src")), "src", "left_semi").join(
                active.select(F.col("id").alias("dst")), "dst", "left_semi"
            ),
            eager=True,
        )
        n_active = active.count()

    if n_active:
        raise RuntimeError("scc: outer loop did not converge")
    return result


def condensation_layers(edges: DataFrame) -> DataFrame:
    """Condensation-DAG layering over the SCC decomposition — the
    ontology/taxonomy depth view of a directed KG.

    Contracts every SCC to one node (id = the SCC label, i.e. min member
    id), keeps the distinct cross-SCC edges (the condensation is a DAG by
    construction — any cycle among SCCs would itself be one SCC), and
    assigns each condensed node its LONGEST-path layer:

        layer(c) = 0 if c has no incoming condensation edge,
                   else 1 + max(layer of predecessors)

    — the topological level, deterministic and schedule-independent, so
    the DuckDB oracle (registry ``scc_layers``) replays it round-free via
    a recursive path-length closure + MAX.  Returns
    (scc, layer, n_members) per condensed node.

    Scale posture: the condensation is vocabulary-bounded (|SCCs| ≤ |V|,
    usually far smaller), the layering loop is a groupBy-max + join per
    round, rounds = DAG depth, every iteration lineage-cut.  Layer
    propagation only increases and is bounded by depth, so convergence
    rides the same changed-row count as the SCC coloring fixpoint.
    """
    scc_map = cut_lineage(strongly_connected_components(edges), eager=True)
    e = edges.where(F.col("src") != F.col("dst"))
    ce = (
        e.join(
            scc_map.select(F.col("id").alias("src"), F.col("scc").alias("csrc")),
            "src",
        )
        .join(
            scc_map.select(F.col("id").alias("dst"), F.col("scc").alias("cdst")),
            "dst",
        )
        .where(F.col("csrc") != F.col("cdst"))
        .select("csrc", "cdst")
        .distinct()
    )
    ce = cut_lineage(ce, eager=True)
    level = cut_lineage(
        scc_map.select("scc").distinct().withColumn("l", F.lit(0).cast("long")),
        eager=True,
    )
    for _ in range(MAX_INNER_ROUNDS):
        cand = (
            ce.join(
                level.select(F.col("scc").alias("csrc"), F.col("l").alias("pl")),
                "csrc",
            )
            .groupBy("cdst")
            .agg((F.max("pl") + F.lit(1)).alias("ml"))
        )
        merged = level.join(cand, level.scc == cand.cdst, "left").select(
            "scc",
            F.col("l"),
            F.greatest(F.col("l"), F.coalesce(F.col("ml"), F.lit(-1))).alias("l2"),
        )
        merged = cut_lineage(merged, eager=True)
        changed = merged.where(F.col("l2") > F.col("l")).count()
        level = merged.select("scc", F.col("l2").alias("l"))
        if changed == 0:
            break
    else:
        raise RuntimeError("scc: layering did not converge (input not a DAG?)")
    members = scc_map.groupBy("scc").agg(F.count("*").alias("n_members"))
    return level.select("scc", F.col("l").alias("layer")).join(members, "scc")
