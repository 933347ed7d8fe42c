"""Deterministic synchronous label propagation (operators/labelprop.py):
equality with a pure-Python reference loop, community convergence on the
fixture shapes, and determinism across parallelism."""

from __future__ import annotations

from openie_spark.operators.labelprop import (
    LABEL_PROP_ITERS,
    PRI_SCALE,
    label_propagation,
)


def _reference(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    und = set()
    for s, d in edges:
        und |= {(s, d), (d, s), (s, s), (d, d)}
    nodes = sorted({u for e in und for u in e})
    labels = {v: v for v in nodes}
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            votes: dict[int, int] = {}
            for u, d in und:
                if d == v:
                    lbl = labels[u]
                    votes[lbl] = votes.get(lbl, 0) + 1
            nxt[v] = max(votes, key=lambda l: votes[l] * PRI_SCALE - l)
        labels = nxt
    return labels


def test_matches_python_reference(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (5, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["label"] for r in label_propagation(df, iters=3).collect()}
    assert got == _reference(edges, 3)


def test_clique_converges_to_min_label(spark):
    base = 100
    clique = [
        (base + i, base + j) for i in range(6) for j in range(i + 1, 6)
    ]
    df = spark.createDataFrame(clique, "src bigint, dst bigint")
    got = {r["id"]: r["label"] for r in label_propagation(df, iters=2).collect()}
    assert set(got.values()) == {base}
    assert got == _reference(clique, 2)


def test_isolated_self_loop_keeps_own_label(spark):
    edges = [(7, 7), (1, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["label"] for r in label_propagation(df, iters=4).collect()}
    assert got[7] == 7
    assert got == _reference(edges, 4)


def test_deterministic_across_parallelism(spark):
    edges = [(i, (i * 7) % 40) for i in range(40)] + [(i, i + 1) for i in range(0, 39, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(map(tuple, label_propagation(df.repartition(1), iters=LABEL_PROP_ITERS).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(4), iters=LABEL_PROP_ITERS).collect()))
    assert a == b == sorted(_reference(edges, LABEL_PROP_ITERS).items())
