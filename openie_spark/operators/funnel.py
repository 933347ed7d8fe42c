"""Ordered-step funnel and weekly cohort retention over the events table.

One home (CLAUDE.md rule): the step list, week format, and both DuckDB
twins live here — the registry queries and their oracles interpolate from
these builders, so the two engines cannot drift.

Semantics
---------
Funnel: a user reaches step k when an event of FUNNEL_STEPS[k-1] occurs
STRICTLY AFTER an event that reached step k-1, where "after" is the total
event order (ts_us, event_id) — the unique bigint event_id makes every
window tie-free in both engines.  Step timestamps are the MINIMUM
qualifying instant per user (microsecond bigints), so the per-step gap
sums are exact integers.

Cohort retention: users are cohorted by the Monday-truncated ISO week of
their first event; activity is the distinct (user, week) grid; retention
is reported as exact ppm (``n_users * 1e6 div cohort_size`` — Spark `div`
== DuckDB `//` on non-negative operands, see tests/unit/test_intdiv_twin).
Weeks cross engines as 'YYYY-MM-DD' strings (both engines truncate weeks
to Monday; zero-padded strings make MIN lexicographic == chronological).

Scale shape (100 TB)
--------------------
Funnel is ONE shuffle on user_id: the two stacked running-min windows
share the same (user_id, ts_us, event_id) sort order (Catalyst plans one
Exchange + one Sort reused by both Window operators) and the final
aggregate is partial+final down to len(FUNNEL_STEPS) rows.  Cohort
retention is the standard two-agg shape — distinct (user, week), per-user
min week on the same user_id shuffle, then an agg keyed on the
calendar-bounded (cohort_week, offset) grid; cohort sizes join back
broadcast.  No global windows, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FUNNEL_STEPS = ("view", "click", "purchase")

RETAIN_PPM = 1_000_000


def funnel_summary(events: DataFrame) -> DataFrame:
    """Per-step funnel counts + exact time-to-step sums.

    Input columns: user_id, event_id (unique bigint), ts (timestamp),
    event_type.  Output: one row per funnel step —
    (step int, step_name, n_users, sum_gap_us) where sum_gap_us is the
    summed microseconds from each user's step-1 instant to their step-k
    instant (0 for step 1 by construction).
    """
    e = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    # frame = all events STRICTLY before the current one in the total
    # (ts_us, event_id) order; min over an empty frame is NULL in both
    # engines, which is exactly the "step not yet reached" marker.
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s_view, s_click, s_buy = FUNNEL_STEPS
    e = e.withColumn(
        "prior_view",
        F.min(F.when(F.col("event_type") == s_view, F.col("ts_us"))).over(w_prev),
    )
    e = e.withColumn(
        "click_q",
        F.when(
            (F.col("event_type") == s_click) & F.col("prior_view").isNotNull(),
            F.col("ts_us"),
        ),
    ).withColumn("prior_click", F.min("click_q").over(w_prev))
    per_user = (
        e.withColumn(
            "buy_q",
            F.when(
                (F.col("event_type") == s_buy) & F.col("prior_click").isNotNull(),
                F.col("ts_us"),
            ),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == s_view, F.col("ts_us"))).alias("s1"),
            F.min("click_q").alias("s2"),
            F.min("buy_q").alias("s3"),
        )
    )
    return (
        per_user.agg(
            F.count("s1").alias("n1"),
            F.count("s2").alias("n2"),
            F.count("s3").alias("n3"),
            F.coalesce(F.sum(F.col("s2") - F.col("s1")), F.lit(0)).alias("g2"),
            F.coalesce(F.sum(F.col("s3") - F.col("s1")), F.lit(0)).alias("g3"),
        )
        .select(
            F.expr(
                f"stack(3, 1, '{s_view}', n1, CAST(0 AS BIGINT),"
                f" 2, '{s_click}', n2, g2,"
                f" 3, '{s_buy}', n3, g3) AS (step, step_name, n_users, sum_gap_us)"
            )
        )
        .orderBy("step")
    )


def funnel_sql() -> str:
    """DuckDB twin of funnel_summary (same step list, same strict-prior
    window frames, same aggregate shape)."""
    s_view, s_click, s_buy = FUNNEL_STEPS
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
w1 AS (
  SELECT *, MIN(CASE WHEN event_type = '{s_view}' THEN ts_us END) OVER
      (PARTITION BY user_id ORDER BY ts_us, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_view
  FROM e
),
w2 AS (
  SELECT *, CASE WHEN event_type = '{s_click}' AND prior_view IS NOT NULL
                 THEN ts_us END AS click_q
  FROM w1
),
w3 AS (
  SELECT *, MIN(click_q) OVER
      (PARTITION BY user_id ORDER BY ts_us, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click
  FROM w2
),
pu AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = '{s_view}' THEN ts_us END) AS s1,
         MIN(click_q) AS s2,
         MIN(CASE WHEN event_type = '{s_buy}' AND prior_click IS NOT NULL
                  THEN ts_us END) AS s3
  FROM w3 GROUP BY user_id
)
SELECT * FROM (
  SELECT 1 AS step, '{s_view}' AS step_name, COUNT(s1) AS n_users,
         CAST(0 AS BIGINT) AS sum_gap_us FROM pu
  UNION ALL
  SELECT 2, '{s_click}', COUNT(s2),
         CAST(COALESCE(SUM(s2 - s1), 0) AS BIGINT) FROM pu
  UNION ALL
  SELECT 3, '{s_buy}', COUNT(s3),
         CAST(COALESCE(SUM(s3 - s1), 0) AS BIGINT) FROM pu
) ORDER BY step
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention grid.

    Output: (cohort_week 'YYYY-MM-DD', week_offset bigint, n_users,
    cohort_size, retained_ppm) — one row per cohort × active week.
    """
    uw = events.select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("week"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    ret = (
        uw.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "CAST(datediff(to_date(week), to_date(cohort_week)) AS BIGINT) div 7"
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    sizes = ret.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            "cohort_size",
            F.expr(f"n_users * {RETAIN_PPM} div cohort_size").alias("retained_ppm"),
        )
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql() -> str:
    """DuckDB twin of cohort_retention (same week format, same ppm rule)."""
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
  FROM events
),
c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id),
r AS (
  SELECT cohort_week,
         CAST(date_diff('day', CAST(cohort_week AS DATE), CAST(week AS DATE)) AS BIGINT)
           // 7 AS week_offset,
         COUNT(DISTINCT uw.user_id) AS n_users
  FROM uw JOIN c USING (user_id) GROUP BY 1, 2
),
s AS (SELECT cohort_week, n_users AS cohort_size FROM r WHERE week_offset = 0)
SELECT r.cohort_week, week_offset, n_users, cohort_size,
       CAST(n_users * {RETAIN_PPM} // cohort_size AS BIGINT) AS retained_ppm
FROM r JOIN s USING (cohort_week) ORDER BY r.cohort_week, week_offset
"""
