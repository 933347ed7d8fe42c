"""AMIE-style path-rule mining support (Galárraga et al., WWW 2013 —
public knowledge): for every relation composition r1∘r2 (paths
h -r1-> x -r2-> t) count the DISTINCT (h,t) pairs it derives
(body_count) and, for every predicate r3 actually connecting such a
pair, the overlap (support); std confidence = support / body_count in
exact micro-unit integral division, so DuckDB replays it bit-for-bit.

Scale shape (100 TB posture).  The r1∘r2 composition join fans out
d_in(x)·d_out(x) paths per mid entity x — the same hub bomb as wedge
enumeration, and on a dense KG a single celebrity entity emits 10^10+
paths while contributing near-zero distinct rule evidence.  The
mitigation mirrors linkpred's center-degree cap (linkpred.py:37): mid
entities whose in-degree OR out-degree exceeds ``MAX_MID_DEGREE`` are
EXCLUDED from the composition.  The hot set is bounded by m/K entities,
so it broadcasts; the exclusion is one broadcast anti-join on the e1
side (killing one side kills the path).  The cap is part of the
operator's declared semantics and the DuckDB twin applies the same
constant, so results stay bit-exact.  Coverage is observable via
``hot_mid_entities`` for callers that want to log exclusions.

Remaining shape: one equi-join on the shared entity collapsed to
DISTINCT (r1,r2,h,t) immediately (multiplicity never reaches the
aggregate), one equi-join of body pairs against the edge set on (h,t),
two map-side-combinable aggs.  Output is predicate-pair-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SUPPORT = 25
MAX_MID_DEGREE = 512


def hot_mid_entities(edges: DataFrame, max_mid_degree: int = MAX_MID_DEGREE) -> DataFrame:
    """edges(pred, head, tail) → single-column ``x`` frame of entities with
    in-degree or out-degree above the cap.  Size-bounded by m/K — always
    broadcastable."""
    d_in = edges.groupBy(F.col("tail").alias("x")).agg(F.count("*").alias("d"))
    d_out = edges.groupBy(F.col("head").alias("x")).agg(F.count("*").alias("d"))
    return (
        d_in.where(F.col("d") > max_mid_degree)
        .select("x")
        .unionByName(d_out.where(F.col("d") > max_mid_degree).select("x"))
        .distinct()
    )


def rule_support(
    edges: DataFrame,
    min_support: int = MIN_SUPPORT,
    max_mid_degree: int = MAX_MID_DEGREE,
) -> DataFrame:
    """edges(pred, head, tail) → (r1, r2, r3, support, body_count,
    conf_micro), compositions through hot mid entities excluded."""
    hot = hot_mid_entities(edges, max_mid_degree)
    e1 = edges.select(
        F.col("pred").alias("r1"), F.col("head").alias("h"), F.col("tail").alias("x")
    ).join(F.broadcast(hot), "x", "left_anti")
    e2 = edges.select(
        F.col("pred").alias("r2"), F.col("head").alias("x"), F.col("tail").alias("t")
    )
    body = e1.join(e2, "x").select("r1", "r2", "h", "t").distinct()
    body_counts = body.groupBy("r1", "r2").agg(F.count("*").alias("body_count"))
    heads = edges.select(
        F.col("pred").alias("r3"), F.col("head").alias("h"), F.col("tail").alias("t")
    )
    support = (
        body.join(heads, ["h", "t"])
        .groupBy("r1", "r2", "r3")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_support)
    )
    return support.join(body_counts, ["r1", "r2"]).select(
        "r1",
        "r2",
        "r3",
        "support",
        "body_count",
        F.expr("CAST(support * 1000000 AS BIGINT) div body_count").alias("conf_micro"),
    )


def rule_support_sql(
    edges_sql: str,
    min_support: int = MIN_SUPPORT,
    max_mid_degree: int = MAX_MID_DEGREE,
) -> str:
    """DuckDB twin over any edges(pred, head, tail) relation SQL.  MUST
    stay in lockstep with :func:`rule_support` — one constant drives both
    (the registry interpolates the same module-level defaults)."""
    return f"""
WITH edges AS ({edges_sql}),
hot AS (
  SELECT tail AS x FROM edges GROUP BY tail HAVING COUNT(*) > {max_mid_degree}
  UNION
  SELECT head AS x FROM edges GROUP BY head HAVING COUNT(*) > {max_mid_degree}
),
body AS (
  SELECT DISTINCT e1.pred AS r1, e2.pred AS r2, e1.head AS h, e2.tail AS t
  FROM edges e1 JOIN edges e2 ON e1.tail = e2.head
  WHERE e1.tail NOT IN (SELECT x FROM hot)
),
body_counts AS (
  SELECT r1, r2, COUNT(*) AS body_count FROM body GROUP BY r1, r2
),
support AS (
  SELECT b.r1, b.r2, e.pred AS r3, COUNT(*) AS support
  FROM body b JOIN edges e ON e.head = b.h AND e.tail = b.t
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {min_support}
)
SELECT s.r1, s.r2, s.r3, s.support, bc.body_count,
       (s.support * 1000000) // bc.body_count AS conf_micro
FROM support s JOIN body_counts bc USING (r1, r2)
ORDER BY r1, r2, r3
"""
