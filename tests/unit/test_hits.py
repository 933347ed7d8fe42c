"""Exact-integer HITS (operators/hits.py): equality with a pure-Python
reference loop, the frozen sink/source zero semantics, and determinism
across parallelism."""

from __future__ import annotations

from openie_spark.operators.hits import HITS_SEED, hits_scores


def _reference(
    edges: list[tuple[int, int]], iters: int, seed: int = HITS_SEED
) -> dict[int, tuple[int, int]]:
    e = sorted(set(edges))
    nodes = sorted({u for p in e for u in p})
    hub = {v: seed for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        auth = {v: 0 for v in nodes}
        for s, d in e:
            auth[d] += hub[s]
        hub = {v: 0 for v in nodes}
        for s, d in e:
            hub[s] += auth[d]
    return {v: (hub[v], auth[v]) for v in nodes}


def _collect(df) -> dict[int, tuple[int, int]]:
    return {r["id"]: (r["hub"], r["auth"]) for r in df.collect()}


def test_matches_python_reference(spark):
    edges = [(1, 2), (2, 3), (3, 1), (4, 2), (4, 3), (5, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert _collect(hits_scores(df, iters=3)) == _reference(edges, 3)


def test_cycle_is_stationary(spark):
    # pure directed cycle: in/out degree 1 everywhere → hub = auth = seed
    edges = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(hits_scores(df, iters=4))
    assert all(v == (HITS_SEED, HITS_SEED) for v in got.values())


def test_source_and_sink_zero_semantics(spark):
    # 1 -> 2 only: node 2 is a sink (hub 0), node 1 a source (auth 0)
    edges = [(1, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = _collect(hits_scores(df, iters=2))
    assert got == _reference(edges, 2)
    assert got[2][0] == 0 and got[1][1] == 0


def test_duplicate_edges_collapse(spark):
    edges = [(1, 2), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    assert _collect(hits_scores(df, iters=3)) == _reference(edges, 3)


def test_deterministic_across_parallelism(spark):
    edges = [(i, (i * 5 + 7) % 60) for i in range(60)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(_collect(hits_scores(df.repartition(1), iters=4)).items())
    b = sorted(_collect(hits_scores(df.repartition(4), iters=4)).items())
    assert a == b == sorted(_reference(edges, 4).items())
