"""User-activity analytics over the events table: session transition
mining, rolling-window distinct actives, and hourly burst detection.

One home (CLAUDE.md rule): the constants, the Spark builders, and the
DuckDB twins all live here — the registry queries and their oracles
interpolate from these builders, so the two engines cannot drift.  The
session boundary comes from operators/temporal.py's ``with_session_seq``
(SESSION_GAP_US has one home there); the twins interpolate the same
constant.

Semantics
---------
Transitions: within a session (same user, gap rule), each event's
``event_type`` transitions to the NEXT event's type in the total
(ts_us, event_id) order; pairs never cross a session boundary.  The
transition probability is exact ppm (``n * 1e6 div src_total`` — Spark
``div`` == DuckDB ``//`` on non-negative operands,
tests/unit/test_intdiv_twin.py).

Rolling actives: a user active on day D contributes to the 7-day windows
ending on days D..D+6; ``users_7d(day)`` = distinct users active in
[day-6, day], ``events_7d`` likewise sums event counts.  Only days that
actually appear in the data are reported.

Bursts: events bucket into absolute UTC hour slots (``epoch_us div
3600e6``); an hour is a burst when its count exceeds 2x the trailing
24-slot average with at least 12 prior non-empty slots of warm-up —
spelled exactly as the integer comparison ``n * 12 > trailing_24h`` (avg
over 24 slots = trailing/24, so n > 2*avg <=> 12n > trailing; empty
slots count as zero by construction of the RANGE frame).

Scale shape (100 TB)
--------------------
Transitions: ONE user_id shuffle — the session window and the lead
window share the identical (user_id x (ts_us, event_id)) spec, so
Catalyst plans one Exchange + one Sort feeding both Window operators;
the pair aggregate is partial+final down to a |type-vocab|^2 grid and
the per-source total is a window over that tiny grid.  Rolling actives:
the (day, user) distinct and the per-day count are linear shuffles; the
7-day window realizes as a bounded explode (factor 7) followed by a
partial+final agg on the calendar-bounded day key — deliberately NOT a
range self-join (which would be a BNLJ) and NOT a global ordered window
over users.  Bursts: the only global-ordered window runs AFTER the
hourly pre-aggregation, on a calendar-bounded series (8.8k rows/year)
— safe at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openie_spark.operators.temporal import SESSION_GAP_US, with_session_seq

PPM = 1_000_000

ROLLING_DAYS = 7  # window = [day - (ROLLING_DAYS-1), day]

BURST_TRAILING_HOURS = 24
BURST_MIN_WARMUP_HOURS = 12  # prior non-empty slots required to flag
_HOUR_US = 3_600_000_000


def session_transitions(events: DataFrame) -> DataFrame:
    """Markov transition counts between event types within sessions.

    Input columns: user_id, event_id (unique bigint), ts, event_type.
    Output: (src_type, dst_type, n_transitions, src_total, prob_ppm),
    one row per observed ordered pair.
    """
    e = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    sess = with_session_seq(e, order_cols=("event_id",))
    # identical partition/order spec as the session window -> one Exchange
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        sess.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
            (F.lead("session_seq").over(w) == F.col("session_seq")).alias("same"),
        )
        .where(F.col("same"))
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    w_src = Window.partitionBy("src_type")  # |vocab|^2 grid only
    return (
        pairs.withColumn("src_total", F.sum("n_transitions").over(w_src))
        .select(
            "src_type",
            "dst_type",
            "n_transitions",
            "src_total",
            F.expr(f"n_transitions * {PPM} div src_total").alias("prob_ppm"),
        )
        .orderBy("src_type", "dst_type")
    )


def session_transitions_sql() -> str:
    """DuckDB twin of session_transitions (same gap rule, same ppm)."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
marked AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w IS NULL
                   OR ts_us - LAG(ts_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
),
pairs AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER w AS dst_type,
         LEAD(session_seq) OVER w = session_seq AS same
  FROM sess WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
agg AS (
  SELECT src_type, dst_type, COUNT(*) AS n_transitions
  FROM pairs WHERE same GROUP BY 1, 2
)
SELECT src_type, dst_type, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY src_type) AS BIGINT) AS src_total,
       CAST(n_transitions * {PPM}
            // SUM(n_transitions) OVER (PARTITION BY src_type) AS BIGINT) AS prob_ppm
FROM agg ORDER BY src_type, dst_type
"""


def rolling_actives(events: DataFrame) -> DataFrame:
    """7-day rolling distinct active users + event volume per day.

    Output: (day 'YYYY-MM-DD', users_7d, events_7d) for each day present
    in the data; the window is the ROLLING_DAYS days ending on `day`.
    """
    span = ROLLING_DAYS - 1
    grid = events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    users7 = (
        grid.select(
            F.explode(F.expr(f"sequence(day, date_add(day, {span}))")).alias(
                "target_day"
            ),
            "user_id",
        )
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )
    events7 = (
        daily.select(
            F.explode(F.expr(f"sequence(day, date_add(day, {span}))")).alias(
                "target_day"
            ),
            "n",
        )
        .groupBy("target_day")
        .agg(F.sum("n").alias("events_7d"))
    )
    present = daily.select(F.col("day").alias("target_day"))
    return (
        users7.join(events7, "target_day")
        .join(F.broadcast(present), "target_day")  # calendar-bounded
        .select(
            F.date_format("target_day", "yyyy-MM-dd").alias("day"),
            "users_7d",
            "events_7d",
        )
        .orderBy("day")
    )


def rolling_actives_sql() -> str:
    """DuckDB twin of rolling_actives (range join is fine at oracle SF)."""
    span = ROLLING_DAYS - 1
    return f"""
WITH g AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1),
u7 AS (
  SELECT d2.day, COUNT(DISTINCT g.user_id) AS users_7d
  FROM d d2 JOIN g ON g.day BETWEEN d2.day - {span} AND d2.day GROUP BY 1
),
e7 AS (
  SELECT d2.day, CAST(SUM(d1.n) AS BIGINT) AS events_7d
  FROM d d2 JOIN d d1 ON d1.day BETWEEN d2.day - {span} AND d2.day GROUP BY 1
)
SELECT strftime(u7.day, '%Y-%m-%d') AS day, users_7d, events_7d
FROM u7 JOIN e7 USING (day) ORDER BY day
"""


def hourly_bursts(events: DataFrame) -> DataFrame:
    """Hourly event counts with trailing-24h burst flags.

    Output: (hr_idx bigint absolute-UTC hour slot, hour timestamp,
    n_events, trailing_24h, prev_hours, is_burst) ordered by hr_idx.
    """
    hourly = (
        events.select(
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {_HOUR_US}").alias(
                "hr_idx"
            )
        )
        .groupBy("hr_idx")
        .agg(F.count("*").alias("n_events"))
    )
    # global ordered window AFTER the agg: calendar-bounded series
    w = Window.orderBy("hr_idx").rangeBetween(-BURST_TRAILING_HOURS, -1)
    return (
        hourly.withColumn(
            "trailing_24h", F.coalesce(F.sum("n_events").over(w), F.lit(0))
        )
        .withColumn("prev_hours", F.count("n_events").over(w))
        .select(
            "hr_idx",
            F.timestamp_seconds(F.col("hr_idx") * 3600).alias("hour"),
            "n_events",
            "trailing_24h",
            "prev_hours",
            F.expr(
                f"CAST(prev_hours >= {BURST_MIN_WARMUP_HOURS}"
                f" AND n_events * {BURST_TRAILING_HOURS // 2} > trailing_24h"
                " AS BIGINT)"
            ).alias("is_burst"),
        )
        .orderBy("hr_idx")
    )


def hourly_bursts_sql() -> str:
    """DuckDB twin of hourly_bursts (same slot rule, same integer flag)."""
    return f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr_idx, COUNT(*) AS n_events
  FROM events GROUP BY 1
),
w AS (
  SELECT hr_idx, n_events,
         CAST(COALESCE(SUM(n_events) OVER tw, 0) AS BIGINT) AS trailing_24h,
         COUNT(n_events) OVER tw AS prev_hours
  FROM h WINDOW tw AS (ORDER BY hr_idx
         RANGE BETWEEN {BURST_TRAILING_HOURS} PRECEDING AND 1 PRECEDING)
)
SELECT hr_idx, make_timestamp(hr_idx * 3600 * 1000000) AS hour, n_events,
       trailing_24h, prev_hours,
       CAST(prev_hours >= {BURST_MIN_WARMUP_HOURS}
            AND n_events * {BURST_TRAILING_HOURS // 2} > trailing_24h
            AS BIGINT) AS is_burst
FROM w ORDER BY hr_idx
"""
