"""KG-completion evaluation — filtered Hits@k / MRR for tail prediction.

The standard link-prediction evaluation protocol (Bordes et al. 2013,
TransE; the "filtered" setting): hold out a test set of (head, pred,
tail) triples, score every candidate tail for each (head, pred), rank
the true tail among the candidates AFTER removing other known-true
tails for that (head, pred) ("filtered" — a competing candidate that is
itself a true fact is not an error), and report Hits@{1,3,10} and MRR.

The scorer here is the **relation-tail popularity baseline**: score(r,
t') = |{(h, r, t') ∈ E}| — the strongest non-learned baseline in the KG
literature and, critically, exact-integer and engine-portable, so the
whole evaluation is hash-comparable against DuckDB (no float model
weights).  The protocol machinery (filtered ranking, hits/MRR
aggregation) is scorer-agnostic: swapping in a learned scorer changes
only the `scores` relation.

All metric arithmetic is exact integer: ranks are bigints, reciprocal
ranks are micro-units via ``1000000 div rank`` (Spark `div` == DuckDB
`//`, both truncate toward zero on non-negative operands — see
tests/unit/test_intdiv_twin.py), MRR is the truncated integer mean of
those micro-units.

Scale shape (the reason this formulation survives 100×):
- The candidate ranking is NEVER materialized per test triple.  A
  single ``pos`` table ranks each relation's tail vocabulary once
  (row_number per pred over (score desc, tail asc) — a total order, so
  both engines agree).  That window sorts the (pred, tail) VOCABULARY,
  which is entity-bounded, not edge-bounded.
- unfiltered rank of the true tail = one equi-join test ⋈ pos on
  (pred, tail): O(|test|) rows.
- the filtered correction = |{t' : (h, r, t') ∈ E, pos(r,t') <
  pos(r,t)}| — an equi-join on (pred, head) whose fan-out is the test
  head's out-degree for that relation, then a count.  filtered_rank =
  pos_t − n_better_true (every better-ranked true tail occupies exactly
  one rank slot above t).
- the test set is a deterministic hash sample (portable_hash60 mod 100
  < TEST_SAMPLE_PCT) — reproducible across engines, retries and
  cluster sizes, no RNG state.

One-home rule (CLAUDE.md): the constants, the Spark builder AND the
DuckDB twin SQL live here; the registry interpolates — they cannot
fork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60, portable_hash60_sql

# Deterministic test split: H60(pred|head|tail) mod 100 < PCT.
TEST_SAMPLE_PCT = 2
# Hits@k cutoffs — fixed by the literature's reporting convention.
HITS_KS = (1, 3, 10)
MRR_SCALE = 1_000_000


def tail_popularity_pos(edges: DataFrame) -> DataFrame:
    """(pred, tail, score, pos): per-relation tail popularity and its
    dense ordinal position (score desc, tail asc — a total order).  The
    window sorts each relation's tail VOCABULARY (entity-bounded); at
    cluster scale a single hot relation's vocabulary still fits one
    task because it is capped by the entity count, not the edge count."""
    scores = edges.groupBy("pred", "tail").agg(
        F.count("*").cast("long").alias("score")
    )
    w = Window.partitionBy("pred").orderBy(F.desc("score"), F.asc("tail"))
    return scores.withColumn("pos", F.row_number().over(w).cast("long"))


def kg_completion_eval(
    edges: DataFrame, test_sample_pct: int = TEST_SAMPLE_PCT
) -> DataFrame:
    """Filtered tail-prediction metrics per relation over a distinct
    (pred, head, tail) edge set.  Returns one row per pred:
    (pred, n_test, hits1, hits3, hits10, sum_rank, sum_rr_micros,
    mrr_micro) — all counts/sums exact bigints."""
    pos = tail_popularity_pos(edges)

    test = edges.where(
        portable_hash60(F.concat_ws("|", "pred", "head", "tail")) % 100
        < F.lit(test_sample_pct)
    )
    # unfiltered ordinal rank of the true tail.
    tp = test.join(pos.select("pred", "tail", "pos"), ["pred", "tail"]).select(
        "pred", "head", "tail", F.col("pos").alias("pos_t")
    )
    # true tails ranked strictly above the test tail, per test triple.
    e_pos = edges.join(pos.select("pred", "tail", "pos"), ["pred", "tail"]).select(
        "pred", "head", F.col("tail").alias("tail2"), F.col("pos").alias("pos2")
    )
    bt = (
        tp.join(e_pos, ["pred", "head"])
        .where(F.col("pos2") < F.col("pos_t"))
        .groupBy("pred", "head", "tail")
        .agg(F.count("*").cast("long").alias("n_better_true"))
    )
    ranked = (
        tp.join(bt, ["pred", "head", "tail"], "left")
        .withColumn(
            "frank",
            F.col("pos_t") - F.coalesce(F.col("n_better_true"), F.lit(0)),
        )
        .select("pred", "frank")
    )
    hits = [
        F.sum(F.when(F.col("frank") <= k, 1).otherwise(0))
        .cast("long")
        .alias(f"hits{k}")
        for k in HITS_KS
    ]
    return (
        ranked.groupBy("pred")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            *hits,
            F.sum("frank").cast("long").alias("sum_rank"),
            F.sum(F.expr(f"{MRR_SCALE} div frank")).cast("long").alias(
                "sum_rr_micros"
            ),
        )
        .withColumn("mrr_micro", F.expr("sum_rr_micros div n_test"))
    )


def kg_completion_eval_sql(
    edges_sql: str, test_sample_pct: int = TEST_SAMPLE_PCT
) -> str:
    """DuckDB twin over any edges(pred, head, tail) relation SQL.  MUST
    stay in lockstep with :func:`kg_completion_eval` — one constant set
    drives both (the registry interpolates the same module defaults)."""
    h60 = portable_hash60_sql("concat_ws('|', pred, head, tail)")
    hits = ",\n       ".join(
        f"CAST(SUM(CASE WHEN frank <= {k} THEN 1 ELSE 0 END) AS BIGINT) AS hits{k}"
        for k in HITS_KS
    )
    return f"""
WITH edges AS ({edges_sql}),
test AS (
  SELECT * FROM edges WHERE {h60} % 100 < {test_sample_pct}
),
scores AS (
  SELECT pred, tail, CAST(COUNT(*) AS BIGINT) AS score
  FROM edges GROUP BY 1, 2
),
pos AS (
  SELECT pred, tail, CAST(row_number() OVER (
    PARTITION BY pred ORDER BY score DESC, tail ASC
  ) AS BIGINT) AS pos
  FROM scores
),
tp AS (
  SELECT t.pred, t.head, t.tail, p.pos AS pos_t
  FROM test t JOIN pos p USING (pred, tail)
),
bt AS (
  SELECT tp.pred, tp.head, tp.tail,
         CAST(COUNT(*) AS BIGINT) AS n_better_true
  FROM tp
  JOIN edges e ON e.pred = tp.pred AND e.head = tp.head
  JOIN pos p2 ON p2.pred = e.pred AND p2.tail = e.tail
  WHERE p2.pos < tp.pos_t
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT tp.pred, tp.pos_t - COALESCE(bt.n_better_true, 0) AS frank
  FROM tp LEFT JOIN bt USING (pred, head, tail)
)
SELECT pred,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       {hits},
       CAST(SUM(frank) AS BIGINT) AS sum_rank,
       CAST(SUM({MRR_SCALE} // frank) AS BIGINT) AS sum_rr_micros,
       CAST(SUM({MRR_SCALE} // frank) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         AS mrr_micro
FROM ranked
GROUP BY pred
ORDER BY pred
"""
