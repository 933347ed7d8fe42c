"""Semantic gates for the activity operators (operators/activity.py):
session-boundary handling, rolling-window membership, and the burst
warm-up/threshold rules on hand-built rows where the expected output is
computable by eye.  Cross-engine parity is tests/sql/test_oracle_parity.py;
these pin the SEMANTICS."""

from __future__ import annotations

import datetime as dt

from openie_spark.operators.activity import (
    hourly_bursts,
    rolling_actives,
    session_transitions,
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )


def _ev(eid, user, kind, seconds):
    return (eid, user, kind, _T0 + dt.timedelta(seconds=seconds))


def test_transitions_respect_session_boundary(spark):
    rows = [
        # user 1, session 1: a -> b -> a (two transitions)
        _ev(0, 1, "a", 0),
        _ev(1, 1, "b", 10),
        _ev(2, 1, "a", 20),
        # gap > 30 min -> new session; a -> c (one transition); the
        # cross-boundary pair (a@20 -> a@2000) must NOT count
        _ev(3, 1, "a", 20 + 1801),
        _ev(4, 1, "c", 20 + 1802),
    ]
    got = {
        (r["src_type"], r["dst_type"]): (r["n_transitions"], r["src_total"], r["prob_ppm"])
        for r in session_transitions(_events(spark, rows)).collect()
    }
    assert got == {
        ("a", "b"): (1, 2, 500_000),
        ("a", "c"): (1, 2, 500_000),
        ("b", "a"): (1, 1, 1_000_000),
    }


def test_transitions_tie_broken_by_event_id(spark):
    # same instant: total order falls back to event_id
    rows = [_ev(5, 2, "x", 0), _ev(4, 2, "y", 0)]
    got = {
        (r["src_type"], r["dst_type"]): r["n_transitions"]
        for r in session_transitions(_events(spark, rows)).collect()
    }
    assert got == {("y", "x"): 1}


def test_rolling_actives_window_membership(spark):
    day = 86_400
    rows = [
        # user 1 active day 0 and day 8; user 2 active day 0 only
        _ev(0, 1, "a", 0),
        _ev(1, 2, "a", 10),
        _ev(2, 1, "a", 8 * day),
        _ev(3, 1, "a", 8 * day + 5),  # same user+day: distinct-collapsed
    ]
    got = {
        r["day"]: (r["users_7d"], r["events_7d"])
        for r in rolling_actives(_events(spark, rows)).collect()
    }
    # only days PRESENT in the data are reported; day 8 is 8 > 6 days
    # after day 0, so day 0's actives have aged out of its window
    assert got == {"2024-01-01": (2, 2), "2024-01-09": (1, 2)}


def test_bursts_warmup_and_threshold(spark):
    # 12 calm hours (1 event each), then a 3-event hour: trailing=12,
    # prev_hours=12 -> 3*12=36 > 12 and warm-up satisfied -> burst.
    rows = [_ev(i, 1, "a", i * 3600) for i in range(12)]
    rows += [_ev(100 + j, 1, "a", 12 * 3600 + j) for j in range(3)]
    out = {r["hr_idx"]: r for r in hourly_bursts(_events(spark, rows)).collect()}
    base = min(out)
    last = out[base + 12]
    assert (last["n_events"], last["trailing_24h"], last["prev_hours"]) == (3, 12, 12)
    assert last["is_burst"] == 1
    # hour 11 has only 11 prior non-empty slots -> warm-up blocks the flag
    assert out[base + 11]["prev_hours"] == 11
    assert out[base + 11]["is_burst"] == 0


def test_bursts_range_frame_skips_empty_slots(spark):
    # events at hour 0 (x20) and hour 30: the 24-slot trailing window of
    # hour 30 starts at hour 6, so the spike has aged out entirely.
    rows = [_ev(i, 1, "a", i) for i in range(20)]
    rows.append(_ev(99, 1, "a", 30 * 3600))
    out = {r["hr_idx"]: r for r in hourly_bursts(_events(spark, rows)).collect()}
    base = min(out)
    assert out[base + 30]["trailing_24h"] == 0
    assert out[base + 30]["prev_hours"] == 0
    assert out[base + 30]["is_burst"] == 0


def _transitions_reference(rows, gap_us=30 * 60 * 1_000_000):
    """Pure-Python replay of session_transitions: (eid, user, type, ts_us)."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for eid, user, kind, ts_us in rows:
        by_user[user].append((ts_us, eid, kind))
    pairs = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        prev = None  # (ts_us, eid, kind) of previous event in-session
        for ts_us, eid, kind in evs:
            if prev is not None and ts_us - prev[0] <= gap_us:
                pairs[(prev[2], kind)] += 1
            prev = (ts_us, eid, kind)
    totals = defaultdict(int)
    for (src, _), n in pairs.items():
        totals[src] += n
    return {
        (src, dst): (n, totals[src], n * 1_000_000 // totals[src])
        for (src, dst), n in pairs.items()
    }


def test_transitions_match_python_reference_fuzz(spark):
    import datetime as dt
    import random

    for seed in (3, 17, 59):
        rng = random.Random(seed)
        rows = []
        for eid in range(120):
            user = rng.randint(1, 5)
            kind = rng.choice("abc")
            # mix of intra-session gaps and > 30 min session breaks
            ts_us = rng.randint(0, 3) * 31 * 60 * 1_000_000 + rng.randint(0, 10_000_000)
            rows.append((eid, user, kind, ts_us))
        df = spark.createDataFrame(
            [
                (eid, u, k, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=ts))
                for eid, u, k, ts in rows
            ],
            "event_id bigint, user_id bigint, event_type string, ts timestamp",
        )
        got = {
            (r["src_type"], r["dst_type"]): (
                r["n_transitions"],
                r["src_total"],
                r["prob_ppm"],
            )
            for r in session_transitions(df).collect()
        }
        assert got == _transitions_reference(rows), f"seed {seed}"
