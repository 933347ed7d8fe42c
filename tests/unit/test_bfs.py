"""k-hop BFS distances (operators/bfs.py): equality with a pure Python
reference BFS, minimality of distances, early termination, and
determinism across parallelism."""

from __future__ import annotations

from collections import deque

from openie_spark.operators.bfs import khop_distances


def _reference(edges: list[tuple[int, int]], sources: list[int], k: int):
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= k:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _run(spark, edges, sources, k):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["id"]: r["dist"] for r in khop_distances(df, sources, k).collect()}


def test_matches_python_reference(spark):
    # diamond + tail + unreachable island
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (8, 9)]
    got = _run(spark, edges, [1], 3)
    assert got == _reference(edges, [1], 3)
    assert 6 not in got  # 4 hops away, k=3
    assert 8 not in got and 9 not in got  # unreachable island absent


def test_min_distance_wins_over_longer_path(spark):
    # 1->2->3 and 1->3 directly: dist(3) must be 1, not 2
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _run(spark, edges, [1], 5)
    assert got == {1: 0, 2: 1, 3: 1}


def test_multi_source_takes_nearest_seed(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 4)]
    got = _run(spark, edges, [1, 10], 5)
    assert got[4] == 1  # via seed 10, not the 3-hop path from seed 1
    assert got == _reference(edges, [1, 10], 5)


def test_early_termination_beyond_diameter(spark):
    # k far larger than the diameter: loop must break on an empty frontier
    edges = [(1, 2), (2, 3)]
    got = _run(spark, edges, [1], 100)
    assert got == {1: 0, 2: 1, 3: 2}


def test_self_loop_does_not_change_distance(spark):
    edges = [(1, 1), (1, 2), (2, 2)]
    got = _run(spark, edges, [1], 3)
    assert got == {1: 0, 2: 1}


def test_k_zero_returns_seeds_only(spark):
    edges = [(1, 2)]
    got = _run(spark, edges, [1], 0)
    assert got == {1: 0}


def test_deterministic_across_parallelism(spark):
    edges = [(i, (i * 7 + 1) % 60) for i in range(60)]
    df1 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(1)
    df4 = spark.createDataFrame(edges, "src bigint, dst bigint").repartition(4)
    a = sorted(map(tuple, khop_distances(df1, [0, 7], 4).collect()))
    b = sorted(map(tuple, khop_distances(df4, [0, 7], 4).collect()))
    assert a == b == sorted(_reference(edges, [0, 7], 4).items())
