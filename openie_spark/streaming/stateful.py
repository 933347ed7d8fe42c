"""Custom stateful streaming operator (SURVEY.md §2.12 extension):
user-session splitting with ``applyInPandasWithState``.

The batch pipeline already sessionizes with a lag-window (registry
``sessionize``, oracle-checked); this is the *streaming* form, where a
session may span micro-batches: per-user state carries the open session
(start, last-event, count) across triggers, closed sessions are emitted
append-mode when a later event arrives past the gap.  The last session of
every user stays open in the state store — the batch twin used by the
tests therefore compares against "all sessions except each user's final
one" under the identical gap rule.

Ordering semantics (stated precisely — the earlier claim of multiset
purity was wrong and is retracted): events are sorted by ts INSIDE each
micro-batch, so arrival order within a batch never matters.  ACROSS
batches, equality with the batch twin is guaranteed when batch boundaries
respect event time (the availableNow file-backlog case the tests pin).  A
cross-batch late event that lands inside the OPEN session's span (or
within the gap before it) is merged monotonically — ``start`` may move
down, ``last``/``n`` never move backwards — so state is never corrupted
into negative spans or bogus splits; a late event older than the open
session's reach would need event-time watermark timeouts to re-open
closed sessions and is out of scope for the NoTimeout design (it starts
or extends sessions as if current).
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


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_us"])
    ts.sort()
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed: list[tuple] = []
    for t in ts:
        if last is None:
            start, last, n = t, t, 1
        elif t - last > SESSION_GAP_US:
            closed.append((key[0], start, last, n))
            start, last, n = t, t, 1
        else:
            # monotone merge: a cross-batch late event inside (or within
            # gap of) the open session extends it DOWNWARD only via start;
            # last never moves backwards, so spans stay valid and a later
            # event cannot see a false gap
            start = min(start, t)
            last = max(last, t)
            n += 1
    if last is not None:
        state.update((start, last, n))
    if closed:
        yield pd.DataFrame(closed, columns=_OUT_COLS)


def sessionize_stream(events_ts_us: DataFrame) -> DataFrame:
    """events(user_id, ts_us) stream → closed-session stream (append)."""
    return events_ts_us.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
):
    """File-source incremental run: drain the backlog (availableNow), emit
    closed sessions to an exactly-once parquet sink; per-user open sessions
    persist in the state store across runs on the same checkpoint (the
    memory sink cannot recover a checkpoint — parquet can)."""
    events = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
    )
    return (
        sessionize_stream(events)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def closed_sessions_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical gap rule via the SHARED lag-window helper
    (temporal.with_session_seq); drops each user's LAST session (the one
    the stream keeps open in state)."""
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
    return (
        agg.join(last, "user_id")
        .where(F.col("session_seq") != F.col("max_seq"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
