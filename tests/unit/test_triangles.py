"""Degree-oriented triangle counting (operators/triangles.py): exact counts
on known shapes, hub-skew boundedness of the wedge set, and tolerance of
dirty input (dups, self-loops, mixed orientation)."""

from __future__ import annotations

from math import comb

from openie_spark.operators.triangles import (
    _canonical_undirected,
    _oriented_edges,
    triangle_counts,
)


def test_clique_counts_exact(spark):
    n = 7
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {i: comb(n - 1, 2) for i in range(n)}


def test_star_has_no_triangles_and_bounded_wedges(spark):
    """The hub-skew case: a 2000-leaf star.  Orientation sends every edge
    leaf→hub (leaves have the smaller degree), so out-degrees are all <= 1
    and the wedge set is EMPTY — the naive unoriented wedge join would
    enumerate C(2000,2) ~ 2M two-paths at the hub."""
    edges = [(0, i) for i in range(1, 2001)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    und = _canonical_undirected(df)
    e = _oriented_edges(und)
    from pyspark.sql import functions as F

    max_outdeg = e.groupBy("u").count().agg(F.max("count")).collect()[0][0]
    assert max_outdeg == 1  # all leaf→hub
    assert triangle_counts(df).count() == 0


def test_dirty_input_tolerated(spark):
    # triangle 1-2-3 given with dups, reversed orientation, and a self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_two_shared_edge_triangles(spark):
    # triangles (1,2,3) and (2,3,4) sharing edge 2-3
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
