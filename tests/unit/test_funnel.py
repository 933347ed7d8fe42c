"""Semantic gates for the funnel / cohort operators (operators/funnel.py):
strict event-order qualification and cohort-offset arithmetic on hand-built
rows where the expected output is computable by eye.  Cross-engine parity
is tests/sql/test_oracle_parity.py; these pin the SEMANTICS."""

from __future__ import annotations

import datetime as dt

from openie_spark.operators.funnel import cohort_retention, funnel_summary

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, kind, seconds):
    return (eid, user, kind, _T0 + dt.timedelta(seconds=seconds))


def _run_funnel(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    out = funnel_summary(df).collect()
    return {r["step_name"]: (r["n_users"], r["sum_gap_us"]) for r in out}


def test_funnel_strict_order(spark):
    rows = [
        # user 1: full ordered funnel view@0 -> click@10 -> purchase@30
        _ev(0, 1, "view", 0),
        _ev(1, 1, "click", 10),
        _ev(2, 1, "purchase", 30),
        # user 2: click BEFORE any view -> click/purchase never qualify
        _ev(3, 2, "click", 0),
        _ev(4, 2, "view", 5),
        _ev(5, 2, "purchase", 9),
        # user 3: view then purchase with no click -> stops at step 1
        _ev(6, 3, "view", 0),
        _ev(7, 3, "purchase", 1),
    ]
    got = _run_funnel(spark, rows)
    assert got["view"] == (3, 0)
    assert got["click"] == (1, 10_000_000)
    assert got["purchase"] == (1, 30_000_000)


def test_funnel_min_qualifying_instant(spark):
    # two qualified clicks: the gap sums from the EARLIEST qualifying one;
    # the purchase between the view and the first click does not qualify.
    rows = [
        _ev(0, 7, "view", 0),
        _ev(1, 7, "purchase", 1),  # before any qualified click
        _ev(2, 7, "click", 2),
        _ev(3, 7, "click", 4),
        _ev(4, 7, "purchase", 6),
    ]
    got = _run_funnel(spark, rows)
    assert got["view"] == (1, 0)
    assert got["click"] == (1, 2_000_000)
    assert got["purchase"] == (1, 6_000_000)


def test_funnel_same_instant_needs_strictly_prior(spark):
    # click at the SAME timestamp as the view but a later event_id counts
    # (strictly after in (ts, event_id) order); same timestamp with an
    # EARLIER event_id does not.
    rows = [
        _ev(10, 1, "view", 0),
        _ev(11, 1, "click", 0),  # qualifies: later event_id at equal ts
        _ev(20, 2, "click", 0),  # does not: view has the later event_id
        _ev(21, 2, "view", 0),
    ]
    got = _run_funnel(spark, rows)
    assert got["view"] == (2, 0)
    assert got["click"] == (1, 0)


def test_cohort_retention_grid(spark):
    # Mondays: 2024-01-01 and 2024-01-08.  user 1 joins week 0 and returns
    # week 1; user 2 joins week 0 only; user 3 joins week 1.
    rows = [
        _ev(0, 1, "view", 0),
        _ev(1, 1, "view", 7 * 86400 + 3600),
        _ev(2, 2, "view", 3600),
        _ev(3, 3, "view", 8 * 86400),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_users"],
            r["cohort_size"],
            r["retained_ppm"],
        )
        for r in cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1_000_000)
    assert got[("2024-01-01", 1)] == (1, 2, 500_000)
    assert got[("2024-01-08", 0)] == (1, 1, 1_000_000)
    assert len(got) == 3
