"""AMIE-style rule-support mining (operators/rules.py): exact counts on
known shapes, the hot-mid degree cap as hub-skew mitigation, and
Spark/DuckDB twin lockstep when the cap binds (the sf0.01 parity fixture
never trips the cap, so binding behavior is pinned here)."""

from __future__ import annotations

import duckdb

from openie_spark.operators.rules import (
    hot_mid_entities,
    rule_support,
    rule_support_sql,
)

SCHEMA = "pred string, head bigint, tail bigint"


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, SCHEMA)
    rows = rule_support(df, **kw).collect()
    return {(r["r1"], r["r2"], r["r3"]): r for r in rows}


def _fanout(pred_in, pred_out, mid, n_in, n_out, base=1000):
    """n_in edges into ``mid`` plus n_out edges out of it."""
    ins = [(pred_in, base + i, mid) for i in range(n_in)]
    outs = [(pred_out, mid, 2 * base + j) for j in range(n_out)]
    return ins + outs


def test_exact_counts_small_graph(spark):
    # a -r1-> x -r2-> t, with r3 closing (a, t); support == body_count == 1
    edges = [("r1", 1, 2), ("r2", 2, 3), ("r3", 1, 3)]
    got = _run(spark, edges, min_support=1)
    assert set(got) == {("r1", "r2", "r3"), ("r1", "r2", "r1")} - {("r1", "r2", "r1")}
    r = got[("r1", "r2", "r3")]
    assert r["support"] == 1 and r["body_count"] == 1
    assert r["conf_micro"] == 1_000_000


def test_confidence_integral_division(spark):
    # two bodies (1->2->3, 1->2->4), only one closed by r3
    edges = [("r1", 1, 2), ("r2", 2, 3), ("r2", 2, 4), ("r3", 1, 3)]
    got = _run(spark, edges, min_support=1)
    r = got[("r1", "r2", "r3")]
    assert r["support"] == 1 and r["body_count"] == 2
    assert r["conf_micro"] == 500_000


def test_hot_mid_cap_binds(spark):
    """A mid entity over the degree cap contributes NO compositions; a
    cold mid in the same graph still does."""
    cap = 8
    hub = _fanout("a", "b", mid=50, n_in=cap + 1, n_out=2)
    cold = [("a", 1, 2), ("b", 2, 3), ("c", 1, 3)]
    got = _run(spark, hub + cold, min_support=1, max_mid_degree=cap)
    assert ("a", "b", "c") in got  # through cold mid 2
    # every body pair through the hub would need h in the hub's in-set;
    # none may appear
    hub_heads = {h for (_, h, _) in hub[: cap + 1]}
    for r in got.values():
        assert r["support"] <= len(cold)
    df = spark.createDataFrame(hub + cold, SCHEMA)
    hot = {r["x"] for r in hot_mid_entities(df, cap).collect()}
    assert hot == {50}
    assert hub_heads  # sanity: fan-in side non-empty


def test_duckdb_twin_lockstep_with_binding_cap(spark):
    """Spark and the SQL twin agree bit-for-bit on a graph where the cap
    EXCLUDES a hub (the oracle-parity fixture never trips the cap)."""
    cap, min_sup = 4, 1
    edges = (
        _fanout("a", "b", mid=99, n_in=cap + 3, n_out=3)
        + [("a", 1, 2), ("b", 2, 3), ("c", 1, 3), ("a", 4, 5), ("b", 5, 6), ("c", 4, 6)]
    )
    df = spark.createDataFrame(edges, SCHEMA)
    spark_rows = sorted(
        tuple(r) for r in rule_support(df, min_sup, cap).collect()
    )
    values = ", ".join(f"('{p}', {h}, {t})" for p, h, t in edges)
    edges_sql = f"SELECT * FROM (VALUES {values}) AS v(pred, head, tail)"
    duck_rows = sorted(
        tuple(r)
        for r in duckdb.sql(rule_support_sql(edges_sql, min_sup, cap)).fetchall()
    )
    assert spark_rows == duck_rows and spark_rows
