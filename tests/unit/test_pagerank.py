"""Exact-integer PageRank (operators/pagerank.py): equality with a pure
Python reference loop, determinism across parallelism, and the frozen
dangling/no-in-edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.pagerank import pagerank_mass


def _reference(edges: list[tuple[int, int]], iters: int, total: int = 1_000_000):
    nodes = sorted({u for e in edges for u in e})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = total * 15 // 100
    mass = {v: total for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (mass[s] * 17) // (20 * outdeg[s])
        mass = nxt
    return mass


def test_matches_python_reference(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 3), (4, 1), (1, 4), (5, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["mass"] for r in pagerank_mass(df, iters=2).collect()}
    assert got == _reference(edges, 2)


def test_no_in_edge_node_settles_at_base(spark):
    # 9 -> 1 only: node 9 receives nothing after iter 1 → base mass
    edges = [(9, 1), (1, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["mass"] for r in pagerank_mass(df, iters=2).collect()}
    assert got[9] == 150_000
    assert got == _reference(edges, 2)


def test_deterministic_across_parallelism(spark):
    edges = [(i, (i * 7) % 50) for i in range(50)] + [(i, i) for i in range(50)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(map(tuple, pagerank_mass(df.repartition(1), iters=3).collect()))
    b = sorted(map(tuple, pagerank_mass(df.repartition(4), iters=3).collect()))
    assert a == b == sorted(_reference(edges, 3).items())


def test_hub_concentrates_mass(spark):
    # star: every leaf points at the hub — hub must outrank every leaf
    edges = [(i, 0) for i in range(1, 20)] + [(0, 0)] + [(i, i) for i in range(1, 20)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["mass"] for r in pagerank_mass(df, iters=3).collect()}
    assert got[0] > max(v for k, v in got.items() if k != 0)


def _ppr_reference(
    edges: list[tuple[int, int]], seeds: set[int], iters: int, total: int = 1_000_000
):
    nodes = sorted({u for e in edges for u in e})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = total * 15 // 100
    mass = {v: (total if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        nxt = {v: (base if v in seeds else 0) for v in nodes}
        for s, d in edges:
            nxt[d] += (mass[s] * 17) // (20 * outdeg[s])
        mass = nxt
    return mass


def test_ppr_chain_hand_traced(spark):
    from openie_spark.operators.pagerank import ppr_mass

    # seed -> a -> b: after 2 iters a holds the seed's damped re-base
    # send and b the first full send, both computable by hand
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {r["id"]: r["mass"] for r in ppr_mass(df, seeds, iters=2).collect()}
    assert got == {1: 150_000, 2: 127_500, 3: 722_500}
    assert got == _ppr_reference(edges, {1}, 2)


def test_ppr_matches_python_reference(spark):
    from openie_spark.operators.pagerank import ppr_mass

    edges = [(1, 2), (2, 1), (2, 3), (3, 3), (4, 1), (1, 4), (5, 5), (3, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,), (5,)], "id bigint")
    got = {r["id"]: r["mass"] for r in ppr_mass(df, seeds, iters=3).collect()}
    assert got == _ppr_reference(edges, {1, 5}, 3)
    # non-seed nodes unreachable from any seed stay at exactly 0 —
    # here every node is reachable, so assert the seed-localized shape
    assert all(m >= 0 for m in got.values())


def test_ppr_tiny_total_mass_keeps_seed_mass(spark):
    # base = 5*15//100 == 0: the seed FLAG (not a sb>0 proxy) must still
    # give seeds their initial mass so first-hop propagation happens
    from openie_spark.operators.pagerank import ppr_mass

    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {
        r["id"]: r["mass"]
        for r in ppr_mass(df, seeds, iters=1, total_mass=5).collect()
    }
    assert got == _ppr_reference(edges, {1}, 1, total=5)
    assert got[2] == (5 * 17) // 20  # = 4: the first hop survived
