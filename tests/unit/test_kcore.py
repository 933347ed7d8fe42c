"""Round-bounded k-core peeling (operators/kcore.py): equality with a pure
Python reference peel, fixpoint early-exit, chain/clique/star shapes, and
determinism across parallelism."""

from __future__ import annotations

from openie_spark.operators.kcore import kcore_edges, kcore_nodes


def _reference(edges: list[tuple[int, int]], k: int, rounds: int):
    und = {(s, d) for s, d in edges if s != d}
    und |= {(d, s) for s, d in und}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for s, _d in und:
            deg[s] = deg.get(s, 0) + 1
        nxt = {(s, d) for s, d in und if deg[s] >= k and deg.get(d, 0) >= k}
        if nxt == und:
            break
        und = nxt
    return und


def _run(spark, edges, k, rounds):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return set(map(tuple, kcore_edges(df, k, rounds).collect()))


def test_triangle_with_tail_matches_reference(spark):
    # triangle 1-2-3 plus tail 3-4: tail peels at k=2, triangle survives
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    got = _run(spark, edges, k=2, rounds=5)
    assert got == _reference(edges, 2, 5)
    assert got == {(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)}


def test_chain_peels_from_both_ends(spark):
    # path 0-1-...-9 at k=2: two endpoint edges peel per round
    edges = [(i, i + 1) for i in range(9)]
    for rounds in (1, 3, 10):
        assert _run(spark, edges, 2, rounds) == _reference(edges, 2, rounds)
    # full peel: a path has no 2-core
    assert _run(spark, edges, 2, 10) == set()


def test_clique_is_stable_fixpoint(spark):
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    got = _run(spark, clique, k=3, rounds=50)  # early exit, not 50 rounds
    assert got == _reference(clique, 3, 50)
    assert len(got) == 20  # all 10 undirected edges, both orientations


def test_star_and_self_loops(spark):
    edges = [(0, i) for i in range(1, 6)] + [(7, 7)]
    # leaves have degree 1: everything peels at k=2; self-loop dropped
    assert _run(spark, edges, 2, 3) == set()
    # at k=1 the star survives untouched, self-loop still dropped
    got = _run(spark, edges, 1, 3)
    assert got == _reference(edges, 1, 3) and (7, 7) not in got


def test_nodes_view_reports_surviving_degree(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["id"]: r["deg"] for r in kcore_nodes(df, 2, 5).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_deterministic_across_parallelism(spark):
    edges = [(i, (i * 5 + 1) % 40) for i in range(40)] + [
        (i, i + 1) for i in range(20)
    ]
    df1 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(1)
    df8 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(8)
    a = sorted(map(tuple, kcore_edges(df1, 2, 4).collect()))
    b = sorted(map(tuple, kcore_edges(df8, 2, 4).collect()))
    assert a == b == sorted(_reference(edges, 2, 4))
