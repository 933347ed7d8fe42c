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


# ---------------------------------------------------------------------------
# Weighted SSSP (sssp_distances): Bellman-Ford fixpoint vs a pure-Python
# Dijkstra reference, plus the re-relaxation property hop-BFS cannot express.
# ---------------------------------------------------------------------------


def _dijkstra(wedges, sources):
    import heapq

    adj = {}
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, w))
    dist = {s: 0 for s in sources}
    pq = [(0, s) for s in sources]
    heapq.heapify(pq)
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _run_sssp(spark, wedges, sources):
    from openie_spark.operators.bfs import sssp_distances

    df = spark.createDataFrame(wedges, "src bigint, dst bigint, w bigint")
    rows = sssp_distances(df, sources).collect()
    got = {r["id"]: r["dist"] for r in rows}
    assert len(rows) == len(got), "duplicate id rows"
    return got


def test_sssp_relaxes_early_discovery(spark):
    # direct edge costs 9; the 3-hop detour costs 3 — a hop-BFS would
    # settle node 2 at the direct discovery, SSSP must re-relax it
    wedges = [(1, 2, 9), (1, 3, 1), (3, 4, 1), (4, 2, 1)]
    got = _run_sssp(spark, wedges, [1])
    assert got == {1: 0, 2: 3, 3: 1, 4: 2}


def test_sssp_fixture_matches_dijkstra(spark):
    from openie_spark.fixtures.gen_graphs import digraph
    from openie_spark.plans.registry import SSSP_W_MOD, _sssp_seeds

    wedges = [
        (s, d, 1 + (s + d) % SSSP_W_MOD) for s, d in digraph() if s != d
    ]
    got = _run_sssp(spark, wedges, _sssp_seeds())
    assert got == _dijkstra(wedges, _sssp_seeds())


def test_sssp_random_digraphs_match_dijkstra(spark):
    import random

    for seed in (11, 42):
        rng = random.Random(seed)
        n = 40
        wedges = [
            (a, b, rng.randint(1, 7))
            for a in range(n)
            for b in range(n)
            if a != b and rng.random() < 0.06
        ]
        sources = [0, n // 2]
        got = _run_sssp(spark, wedges, sources)
        assert got == _dijkstra(wedges, sources)


def test_sssp_seed_without_edges_is_present(spark):
    got = _run_sssp(spark, [(1, 2, 5)], [1, 99])
    assert got == {1: 0, 2: 5, 99: 0}


def test_sssp_deterministic_across_parallelism(spark):
    wedges = [(i, (i * 7 + 1) % 60, 1 + (i % 4)) for i in range(60)]
    df1 = spark.createDataFrame(wedges, "src bigint, dst bigint, w bigint").repartition(1)
    df5 = spark.createDataFrame(wedges, "src bigint, dst bigint, w bigint").repartition(5)
    from openie_spark.operators.bfs import sssp_distances

    a = sorted(map(tuple, sssp_distances(df1, [0, 7]).collect()))
    b = sorted(map(tuple, sssp_distances(df5, [0, 7]).collect()))
    assert a == b == sorted(_dijkstra(wedges, [0, 7]).items())
