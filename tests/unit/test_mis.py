"""Deterministic hash-priority MIS (operators/mis.py): independence,
maximality (at sufficient rounds), determinism, and fixture shapes."""

from __future__ import annotations

from openie_spark.operators.mis import maximal_independent_set


def _mis(spark, edges, rounds=16):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"] for r in maximal_independent_set(df, rounds=rounds).collect()}


def _check_independent_and_maximal(mis, edges):
    und = {(a, b) for a, b in edges if a != b} | {
        (b, a) for a, b in edges if a != b
    }
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert not any((a, b) in und for a in mis for b in mis), "not independent"
    for v in nodes - mis:
        assert any((v, m) in und for m in mis), f"node {v} uncovered"


def test_clique_exactly_one(spark):
    n = 8
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    mis = _mis(spark, edges)
    assert len(mis) == 1
    _check_independent_and_maximal(mis, edges)


def test_chain_independent_and_maximal(spark):
    edges = [(i, i + 1) for i in range(60)]
    mis = _mis(spark, edges)
    _check_independent_and_maximal(mis, edges)
    # a maximal independent set on a 61-path has between ceil(61/3)=21
    # and ceil(61/2)=31 members
    assert 21 <= len(mis) <= 31


def test_star_and_isolated(spark):
    edges = [(0, i) for i in range(1, 40)] + [(100, 100), (101, 101)]
    mis = _mis(spark, edges)
    # self-loop nodes are isolated markers: always selected
    assert {100, 101} <= mis
    _check_independent_and_maximal(mis, [(0, i) for i in range(1, 40)])


def test_round_bound_is_a_fixpoint(spark):
    """On shapes that resolve within the bound, extra rounds change
    nothing — the equality that licenses the round-bounded semantics."""
    edges = [(i, i + 1) for i in range(60)] + [
        (i, j) for i in range(200, 208) for j in range(i + 1, 208)
    ]
    assert _mis(spark, edges, rounds=16) == _mis(spark, edges, rounds=19)


def test_dirty_input(spark):
    clean = _mis(spark, [(0, 1), (1, 2)])
    dirty = _mis(spark, [(0, 1), (1, 0), (0, 1), (1, 2), (2, 1)])
    assert clean == dirty
    _check_independent_and_maximal(clean, [(0, 1), (1, 2)])
