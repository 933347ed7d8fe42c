"""L1 tests for temporal joins (operators/temporal.py): as-of semantics
(ties, no-match, inner mode) and banded interval containment (boundaries,
band-spanning intervals, no duplicate pairs) — plus the plan-shape gates
that make these the scale-safe formulations (no BroadcastNestedLoop /
cartesian anywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.temporal import asof_join, interval_join_banded


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k bigint, ts bigint, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, 100, 11, "r11"),  # tie with left ts=100 → counts (<=)
            (1, 100, 12, "r12"),  # same ts tie → greatest tiebreak wins
            (1, 200, 13, "r13"),
            (2, 60, 21, "r21"),  # after left ts=50 → no match for 'c'
        ],
        "k bigint, rts bigint, rid bigint, rv string",
    )


def test_asof_semantics(spark):
    got = {
        (r["k"], r["tag"]): (r["rid"], r["rv"])
        for r in asof_join(
            _left(spark), _right(spark), "k", "ts", "rts", ["rid", "rv"],
            tiebreak=["rid"],
        ).collect()
    }
    assert got[(1, "a")] == (12, "r12")  # ts tie counts; greatest rid wins
    assert got[(1, "b")] == (13, "r13")  # latest earlier row
    assert got[(2, "c")] == (None, None)  # only future right rows
    assert got[(3, "d")] == (None, None)  # key absent on the right


def test_asof_null_right_values_do_not_mix_rows(spark):
    """The matched right row must be carried ATOMICALLY: when the newest
    right row has a NULL value column, per-column carry would splice in an
    older row's value — the struct carry must return the actual row."""
    left = spark.createDataFrame([(1, 100, "x")], "k bigint, ts bigint, tag string")
    right = spark.createDataFrame(
        [(1, 10, 5, "old"), (1, 20, None, "new")],
        "k bigint, rts bigint, a int, b string",
    )
    (row,) = asof_join(left, right, "k", "ts", "rts", ["a", "b"]).collect()
    assert (row["a"], row["b"]) == (None, "new")  # the ts=20 row, verbatim


def test_asof_null_right_ts_excluded(spark):
    """Right rows with NULL right_ts are not 'as of' anything — they must
    never match (the naive nulls-first sort would carry them everywhere)."""
    left = spark.createDataFrame([(1, 100, "x")], "k bigint, ts bigint, tag string")
    right = spark.createDataFrame(
        [(1, None, 9, "phantom")], "k bigint, rts bigint, a int, b string"
    )
    (row,) = asof_join(left, right, "k", "ts", "rts", ["a", "b"]).collect()
    assert (row["a"], row["b"]) == (None, None)


def test_asof_inner_drops_unmatched(spark):
    got = asof_join(
        _left(spark), _right(spark), "k", "ts", "rts", ["rid"],
        tiebreak=["rid"], how="inner",
    )
    assert {r["tag"] for r in got.collect()} == {"a", "b"}


def test_asof_plan_has_no_join_node(spark):
    plan = (
        asof_join(_left(spark), _right(spark), "k", "ts", "rts", ["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan, bad


def test_interval_banded_containment(spark):
    band = 100
    intervals = spark.createDataFrame(
        [(1, 50, 250), (2, 300, 310), (3, 400, 400)],
        "iid bigint, s bigint, e bigint",
    )
    points = spark.createDataFrame(
        [(10, 49), (11, 50), (12, 150), (13, 250), (14, 251), (15, 305), (16, 400)],
        "pid bigint, p bigint",
    )
    got = sorted(
        (r["iid"], r["pid"])
        for r in interval_join_banded(
            points, intervals, "p", "s", "e", band_us=band
        ).collect()
    )
    # inclusive bounds; interval 1 spans three bands but each pair once
    assert got == [(1, 11), (1, 12), (1, 13), (2, 15), (3, 16)]


def test_interval_banded_plan_no_cartesian(spark):
    intervals = spark.range(5).select(
        F.col("id").alias("iid"), (F.col("id") * 100).alias("s"),
        (F.col("id") * 100 + 50).alias("e"),
    )
    points = spark.range(50).select(
        F.col("id").alias("pid"), (F.col("id") * 7).alias("p")
    )
    plan = (
        interval_join_banded(points, intervals, "p", "s", "e", band_us=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
