"""Strongly connected components (operators/scc.py): fixture-shape pins,
totality, and a randomized brute-force cross-check against a pure-Python
Tarjan reference (the walks/temporal cross-check pattern)."""

from __future__ import annotations

import random
import sys

from openie_spark.fixtures.gen_graphs import (
    DBIPATH_BASE,
    DBIPATH_N,
    DBRIDGE_BASE,
    DBRIDGE_LEN,
    DBRIDGE_OFF,
    DCHAIN_BASE,
    DCHAIN_N,
    DCYC_BASE,
    DCYC_K,
    DCYC_LEN,
    DISO_BASE,
    DISO_N,
    digraph,
)
from openie_spark.operators.scc import (
    condensation_layers,
    strongly_connected_components,
)


def _tarjan(edges):
    """Iterative Tarjan — reference SCC with scc = min member id."""
    sys.setrecursionlimit(100000)
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index, low, onstack, stack, out = {}, {}, set(), [], {}
    ctr = [0]
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = ctr[0]
                ctr[0] += 1
                stack.append(v)
                onstack.add(v)
            descended = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    descended = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if not descended:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        onstack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = strongly_connected_components(df).collect()
    got = {r["id"]: r["scc"] for r in rows}
    assert len(rows) == len(got), "duplicate id rows"
    return got


def test_fixture_matches_tarjan_and_shape_pins(spark):
    edges = digraph()
    got = _run(spark, edges)
    truth = _tarjan(edges)
    assert got == truth
    # every directed cycle is one SCC labeled by its smallest node
    for c in range(DCYC_K):
        lo = DCYC_BASE + c * DCYC_LEN
        assert all(got[lo + i] == lo for i in range(DCYC_LEN))
    # ascending chain: all singletons
    assert all(got[DCHAIN_BASE + i] == DCHAIN_BASE + i for i in range(DCHAIN_N))
    # doubly-linked path: one SCC
    assert all(got[DBIPATH_BASE + i] == DBIPATH_BASE for i in range(DBIPATH_N))
    # one-way bridge must NOT merge the two cycles
    assert got[DBRIDGE_BASE] == DBRIDGE_BASE
    assert got[DBRIDGE_BASE + DBRIDGE_OFF] == DBRIDGE_BASE + DBRIDGE_OFF
    assert all(
        got[DBRIDGE_BASE + DBRIDGE_OFF + i] == DBRIDGE_BASE + DBRIDGE_OFF
        for i in range(DBRIDGE_LEN)
    )
    # self-loop isolates: singleton SCCs, present in the output
    assert all(got[DISO_BASE + i] == DISO_BASE + i for i in range(DISO_N))


def test_random_digraphs_match_tarjan(spark):
    for seed in (7, 23):
        rng = random.Random(seed)
        n = 48
        edges = [
            (a, b)
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.045
        ]
        edges.append((0, 0))  # keep node 0 present even if otherwise isolated
        got = _run(spark, edges)
        assert got == _tarjan(edges)


def test_two_cycle_and_empty(spark):
    got = _run(spark, [(1, 2), (2, 1), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 3}
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert strongly_connected_components(empty).count() == 0


def _layers_reference(edges):
    """Condensation + longest-path layers from the Tarjan SCC map."""
    sccm = _tarjan(edges)
    cedges = {(sccm[s], sccm[d]) for s, d in edges if sccm[s] != sccm[d]}
    preds = {}
    for a, b in cedges:
        preds.setdefault(b, set()).add(a)
    layer = {}

    def level(c):
        if c not in layer:
            layer[c] = (
                0 if not preds.get(c) else 1 + max(level(p) for p in preds[c])
            )
        return layer[c]

    members = {}
    for v, c in sccm.items():
        members[c] = members.get(c, 0) + 1
    return {c: (level(c), members[c]) for c in set(sccm.values())}


def test_condensation_layers_cycle_into_chain(spark):
    # 2-cycle {1,2} -> 3 -> 4: layers 0, 1, 2; member counts 2, 1, 1
    edges = [(1, 2), (2, 1), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["scc"]: (r["layer"], r["n_members"])
        for r in condensation_layers(df).collect()
    }
    assert got == {1: (0, 2), 3: (1, 1), 4: (2, 1)}


def test_condensation_layers_fixture_matches_reference(spark):
    edges = digraph()
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["scc"]: (r["layer"], r["n_members"])
        for r in condensation_layers(df).collect()
    }
    assert got == _layers_reference(edges)


def test_scc_and_layers_deterministic_across_parallelism(spark):
    edges = digraph()
    df1 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(1)
    df7 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(7)
    a = sorted(map(tuple, strongly_connected_components(df1).collect()))
    b = sorted(map(tuple, strongly_connected_components(df7).collect()))
    assert a == b
    la = sorted(map(tuple, condensation_layers(df1).collect()))
    lb = sorted(map(tuple, condensation_layers(df7).collect()))
    assert la == lb
