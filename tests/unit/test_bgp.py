"""BGP matching (operators/bgp.py): hand-computed bindings on known
graphs, every term shape (constant pred/entity, variable pred, repeated
var within a pattern, cycle across patterns, disconnected groups), and
Spark/DuckDB twin lockstep via bgp_sql on a seeded random graph."""

from __future__ import annotations

import random

import duckdb
import pytest

from openie_spark.operators.bgp import bgp_sql, match_bgp

SCHEMA = "pred string, head bigint, tail bigint"


def _run(spark, edges, patterns, select=None):
    df = spark.createDataFrame(edges, SCHEMA)
    rows = match_bgp(df, patterns, select).collect()
    return {tuple(r) for r in rows}


def test_single_pattern_constant_pred(spark):
    edges = [("knows", 1, 2), ("knows", 2, 3), ("likes", 1, 3)]
    got = _run(spark, edges, [("?a", "knows", "?b")])
    assert got == {(1, 2), (2, 3)}


def test_constant_subject_and_object(spark):
    edges = [("knows", 1, 2), ("knows", 1, 3), ("knows", 2, 3)]
    assert _run(spark, edges, [(1, "knows", "?b")]) == {(2,), (3,)}
    assert _run(spark, edges, [("?a", "knows", 3)]) == {(1,), (2,)}


def test_variable_predicate(spark):
    edges = [("knows", 1, 2), ("likes", 1, 2), ("knows", 2, 3)]
    got = _run(spark, edges, [(1, "?p", 2)])
    assert got == {("knows",), ("likes",)}


def test_repeated_var_within_pattern(spark):
    edges = [("knows", 1, 1), ("knows", 1, 2), ("knows", 3, 3)]
    got = _run(spark, edges, [("?x", "knows", "?x")])
    assert got == {(1,), (3,)}


def test_two_hop_join(spark):
    edges = [("knows", 1, 2), ("knows", 2, 3), ("knows", 2, 4), ("knows", 9, 9)]
    got = _run(spark, edges, [("?a", "knows", "?b"), ("?b", "knows", "?c")])
    assert got == {(1, 2, 3), (1, 2, 4), (9, 9, 9)}


def test_cycle_constraint(spark):
    # triangle 1->2->3->1 plus a non-closing path 1->2->4
    edges = [("e", 1, 2), ("e", 2, 3), ("e", 3, 1), ("e", 2, 4)]
    pats = [("?a", "e", "?b"), ("?b", "e", "?c"), ("?c", "e", "?a")]
    got = _run(spark, edges, pats)
    assert got == {(1, 2, 3), (2, 3, 1), (3, 1, 2)}


def test_select_projection_distinct(spark):
    # two bindings that coincide after projection → set semantics dedups
    edges = [("e", 1, 2), ("e", 1, 3), ("e", 2, 9), ("e", 3, 9)]
    pats = [(1, "e", "?m"), ("?m", "e", "?t")]
    got = _run(spark, edges, pats, select=["?t"])
    assert got == {(9,)}


def test_disconnected_groups_cartesian(spark):
    edges = [("a", 1, 2), ("b", 7, 8), ("b", 7, 9)]
    got = _run(spark, edges, [("?x", "a", "?y"), ("?u", "b", "?v")])
    assert got == {(1, 2, 7, 8), (1, 2, 7, 9)}


def test_needs_a_variable(spark):
    df = spark.createDataFrame([("e", 1, 2)], SCHEMA)
    with pytest.raises(ValueError):
        match_bgp(df, [(1, "e", 2)])
    with pytest.raises(ValueError):
        bgp_sql("SELECT 1", [(1, "e", 2)])




@pytest.mark.parametrize("seed", [411, 1202, 9091])
def test_duckdb_twin_lockstep_random_graph(spark, seed):
    """match_bgp and bgp_sql agree on seeded random graphs for a mixed
    pattern set (constant pred + variable pred + cycle)."""
    rng = random.Random(seed)
    edges = list(
        {
            (rng.choice(["p", "q", "r"]), rng.randrange(12), rng.randrange(12))
            for _ in range(160)
        }
    )
    pats = [("?a", "p", "?b"), ("?b", "?pr", "?c"), ("?c", "q", "?a")]
    sel = ["?a", "?b", "?c", "?pr"]
    df = spark.createDataFrame(edges, SCHEMA)
    got = {tuple(r) for r in match_bgp(df, pats, sel).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edges (pred VARCHAR, head BIGINT, tail BIGINT)"
    )
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", edges)
    want = {
        tuple(r)
        for r in con.execute(
            bgp_sql("SELECT pred, head, tail FROM edges", pats, sel)
        ).fetchall()
    }
    assert got == want and got  # non-vacuous


# ---------------------------------------------------------------------------
# OPTIONAL groups (left-join semantics)
# ---------------------------------------------------------------------------


def _run_opt(spark, edges, patterns, optional, select=None):
    df = spark.createDataFrame(edges, SCHEMA)
    rows = match_bgp(df, patterns, select, optional=optional).collect()
    return {tuple(r) for r in rows}


def test_optional_binds_null_when_unmatched(spark):
    edges = [("based_in", 1, 10), ("based_in", 2, 10), ("placed_by", 100, 1)]
    got = _run_opt(
        spark,
        edges,
        [("?c", "based_in", "?n")],
        [[("?o", "placed_by", "?c")]],
    )
    assert got == {(1, 10, 100), (2, 10, None)}


def test_optional_multiple_matches_keep_all(spark):
    edges = [("based_in", 1, 10), ("placed_by", 100, 1), ("placed_by", 101, 1)]
    got = _run_opt(
        spark, edges, [("?c", "based_in", "?n")], [[("?o", "placed_by", "?c")]]
    )
    assert got == {(1, 10, 100), (1, 10, 101)}


def test_two_optional_groups_join_required_only(spark):
    edges = [
        ("based_in", 1, 10),
        ("placed_by", 100, 1),
        ("vip", 1, 1),
    ]
    got = _run_opt(
        spark,
        edges,
        [("?c", "based_in", "?n")],
        [[("?o", "placed_by", "?c")], [("?c", "vip", "?v")]],
    )
    assert got == {(1, 10, 100, 1)}


def test_optional_group_refusals(spark):
    df = spark.createDataFrame([("e", 1, 2)], SCHEMA)

    with pytest.raises(ValueError):  # unshared group = hidden cross product
        match_bgp(df, [("?a", "e", "?b")], optional=[[("?x", "e", "?y")]])
    with pytest.raises(ValueError):  # group reusing an optional-introduced var
        match_bgp(
            df,
            [("?a", "e", "?b")],
            optional=[[("?b", "e", "?x")], [("?x", "e", "?z")]],
        )
    with pytest.raises(ValueError):
        bgp_sql("SELECT 1", [("?a", "e", "?b")], optional=[[("?x", "e", "?y")]])


@pytest.mark.parametrize("seed", [797, 2718, 31415])
def test_optional_duckdb_twin_lockstep(spark, seed):
    rng = random.Random(seed)
    edges = list(
        {
            (rng.choice(["p", "q", "r"]), rng.randrange(10), rng.randrange(10))
            for _ in range(120)
        }
    )
    pats = [("?a", "p", "?b")]
    opt = [[("?b", "q", "?c")], [("?a", "r", "?d")]]
    df = spark.createDataFrame(edges, SCHEMA)
    got = {tuple(r) for r in match_bgp(df, pats, optional=opt).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE edges (pred VARCHAR, head BIGINT, tail BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", edges)
    want = {
        tuple(r)
        for r in con.execute(
            bgp_sql("SELECT pred, head, tail FROM edges", pats, optional=opt)
        ).fetchall()
    }
    assert got == want and got


# ---------------------------------------------------------------------------
# validation: pred/node kind conflicts, identifier names, reserved words
# ---------------------------------------------------------------------------


def test_pred_node_unification_refused(spark):
    """A variable bound to both the predicate and an entity position would
    make DuckDB raise a cast error while Spark silently null-casts — both
    engines refuse it up front instead."""
    df = spark.createDataFrame([("e", 1, 2)], SCHEMA)
    bad = [("?x", "p", "?c"), ("?a", "?x", "?b")]
    with pytest.raises(ValueError):
        match_bgp(df, bad)
    with pytest.raises(ValueError):
        bgp_sql("SELECT 1", bad)
    with pytest.raises(ValueError):  # same-pattern variant
        match_bgp(df, [("?a", "?a", "?b")])


def test_non_identifier_variable_refused(spark):
    df = spark.createDataFrame([("e", 1, 2)], SCHEMA)
    with pytest.raises(ValueError):
        match_bgp(df, [("?a-b", "e", "?c")])
    with pytest.raises(ValueError):
        bgp_sql("SELECT 1", [("?a;drop", "e", "?c")])


def test_reserved_word_variable_lockstep(spark):
    """?order is a legal variable; the SQL twin quotes the alias so the
    oracle works too."""
    edges = [("placed_by", 100, 1), ("placed_by", 101, 2)]
    df = spark.createDataFrame(edges, SCHEMA)
    pats = [("?order", "placed_by", "?c")]
    got = {tuple(r) for r in match_bgp(df, pats).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE edges (pred VARCHAR, head BIGINT, tail BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", edges)
    want = {
        tuple(r)
        for r in con.execute(
            bgp_sql("SELECT pred, head, tail FROM edges", pats)
        ).fetchall()
    }
    assert got == want == {(100, 1), (101, 2)}


def test_unbound_select_variable_refused_identically(spark):
    """A select entry naming a variable no pattern binds gets the same
    clean ValueError from BOTH entry points (identical-refusal twin
    rule), in the plain, and the optional-group, shapes."""
    df = spark.createDataFrame([("e", 1, 2)], SCHEMA)
    for kwargs in (
        {"select": ["?nope"]},
        {"select": ["?a", "?nope"], "optional": [[("?a", "f", "?c")]]},
    ):
        with pytest.raises(ValueError, match="unbound"):
            match_bgp(df, [("?a", "e", "?b")], **kwargs)
        with pytest.raises(ValueError, match="unbound"):
            bgp_sql("SELECT 1", [("?a", "e", "?b")], **kwargs)
