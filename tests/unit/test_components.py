"""L1/L3 tests for OP-40..44: known graph shapes (FIXTURES.md §5),
idempotence, rep = min(component)."""

from __future__ import annotations

import pytest

from openie_spark.fixtures.gen_graphs import all_graphs, chain, cliques, star
from openie_spark.operators.components import connected_components


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: r.rep for r in connected_components(df).collect()}


@pytest.mark.parametrize(
    "maker", [lambda: chain(200), lambda: cliques(10, 10), lambda: star(1000)]
)
def test_known_shapes(spark, maker):
    edges, expected = maker()
    got = _run(spark, edges)
    assert got == expected


def test_all_graphs_mixed(spark):
    edges, expected = all_graphs()
    got = _run(spark, edges)
    assert got == expected
    # rep = min(component) by construction of expected


def test_idempotence(spark):
    """cc(cc(E)) = cc(E): running CC over its own (id, rep) edges is stable."""
    edges, expected = cliques(5, 8)
    df = spark.createDataFrame(edges, "src long, dst long")
    assign = connected_components(df)
    again = connected_components(
        assign.selectExpr("id as src", "rep as dst")
    )
    got = {r.id: r.rep for r in again.collect()}
    assert got == expected
