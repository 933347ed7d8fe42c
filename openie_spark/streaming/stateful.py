"""Custom stateful streaming operator (SURVEY.md §2.12 extension):
user-session splitting with ``applyInPandasWithState``.

The batch pipeline already sessionizes with a lag-window (registry
``sessionize``, oracle-checked); this is the *streaming* form, where a
session may span micro-batches: per-user state carries the open session
(start, last-event, count) across triggers, closed sessions are emitted
append-mode when a later event arrives past the gap OR — with
``timeout_delay_ms`` set — when the event-time watermark passes the open
session's gap horizon (``EventTimeTimeout``), so an idle user's final
session eventually closes instead of living in the state store forever.

Ordering semantics: events are sorted by ts INSIDE each micro-batch, and
cross-batch late events are handled by INTERVAL MERGE — the new batch's
events are sessionized on their own, then merged with the open state
interval under the same gap rule.  A late event older than
``start - gap`` therefore forms (and immediately closes) its own earlier
session instead of being silently absorbed into the open one (the
round-2 advice case: a merged session can no longer contain an internal
gap larger than SESSION_GAP_US).  Equality with the batch twin is exact
when batch boundaries respect event time (the availableNow file-backlog
case the tests pin); with timeouts, the twin's rule is
``closed_sessions_batch(events, timeout_delay_ms)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from openie_spark.operators.temporal import SESSION_GAP_US, with_session_seq

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", LongType(), True),
    ]
)

_OUT_COLS = [f.name for f in SESSION_OUT_SCHEMA.fields]


def _sessions_of(ts: list[int], gap_us: int) -> list[list[int]]:
    """Pure gap-rule sessionization of sorted timestamps → [start, last, n]."""
    out: list[list[int]] = []
    for t in ts:
        if out and t - out[-1][1] <= gap_us:
            out[-1][1] = max(out[-1][1], t)
            out[-1][2] += 1
        else:
            out.append([t, t, 1])
    return out


def _merge_intervals(sessions: list[list[int]], gap_us: int) -> list[list[int]]:
    """Merge [start, last, n] intervals (any order) under the gap rule."""
    merged: list[list[int]] = []
    for s in sorted(sessions):
        if merged and s[0] - merged[-1][1] <= gap_us:
            merged[-1][1] = max(merged[-1][1], s[1])
            merged[-1][2] += s[2]
        else:
            merged.append(list(s))
    return merged


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # watermark passed the open session's gap horizon: close it
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([(key[0], start, last, n)], columns=_OUT_COLS)
        return
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_us"])
    ts.sort()
    sessions = _sessions_of(ts, SESSION_GAP_US)
    if state.exists:
        sessions = _merge_intervals(sessions + [list(state.get)], SESSION_GAP_US)
    if not sessions:
        return
    closed = [(key[0], s[0], s[1], s[2]) for s in sessions[:-1]]
    start, last, n = sessions[-1]
    state.update((start, last, n))
    try:
        # event-time ms; no-op unless the query runs with EventTimeTimeout
        state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    except Exception:
        pass  # NoTimeout mode: setting a timestamp is illegal there
    if closed:
        yield pd.DataFrame(closed, columns=_OUT_COLS)


def sessionize_stream(
    events_ts_us: DataFrame, timeout: bool = False
) -> DataFrame:
    """events(user_id, ts_us[, ts]) stream → closed-session stream (append).

    ``timeout=True`` uses EventTimeTimeout — the input must carry a
    watermark (``withWatermark`` upstream); idle sessions close when the
    watermark passes ``last + gap``."""
    conf = (
        GroupStateTimeout.EventTimeTimeout
        if timeout
        else GroupStateTimeout.NoTimeout
    )
    return events_ts_us.groupBy("user_id").applyInPandasWithState(
        _session_fn, SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA, "append", conf
    )


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
    timeout_delay_ms: int | None = None,
):
    """File-source incremental run: drain the backlog (availableNow), emit
    closed sessions to an exactly-once parquet sink.  Without
    ``timeout_delay_ms`` per-user open sessions persist in the state store
    across runs on the same checkpoint; with it, a watermark of that delay
    is applied and open sessions whose gap horizon falls behind the final
    watermark are closed by event-time timeout (fired in the trailing
    no-data micro-batch availableNow executes for stateful queries)."""
    events = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    if timeout_delay_ms is not None:
        events = events.withWatermark("ts", f"{int(timeout_delay_ms)} milliseconds")
    events = events.select(
        "user_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    return (
        sessionize_stream(events, timeout=timeout_delay_ms is not None)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def closed_sessions_batch(
    events: DataFrame, timeout_delay_ms: int | None = None
) -> DataFrame:
    """Batch twin: identical gap rule via the SHARED lag-window helper
    (temporal.with_session_seq).

    Without ``timeout_delay_ms``: drops each user's LAST session (the one
    the NoTimeout stream keeps open in state).  With it: replicates the
    event-time-timeout rule — a session is closed iff a successor event
    exists past the gap OR its gap horizon fell strictly behind the final
    watermark, i.e. ``(end_us + gap)//1000 < max(ts_us)//1000 - delay_ms``
    (the //1000 truncations mirror Spark's ms-precision watermark and
    ms-valued timeout timestamps)."""
    e = events.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    sess = with_session_seq(e)
    agg = sess.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    )
    last = agg.groupBy("user_id").agg(F.max("session_seq").alias("max_seq"))
    withlast = agg.join(last, "user_id")
    if timeout_delay_ms is None:
        keep = F.col("session_seq") != F.col("max_seq")
        return withlast.where(keep).select(
            "user_id", "session_start_us", "session_end_us", "n_events"
        )
    wm = e.agg(
        (F.floor(F.max("ts_us") / 1000) - F.lit(int(timeout_delay_ms))).alias(
            "wm_ms"
        )
    )
    return (
        withlast.crossJoin(F.broadcast(wm))
        .where(
            (F.col("session_seq") != F.col("max_seq"))
            | (
                F.floor((F.col("session_end_us") + F.lit(SESSION_GAP_US)) / 1000)
                < F.col("wm_ms")
            )
        )
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
