"""Common-neighbor / Jaccard link prediction (operators/linkpred.py):
exact scores on known shapes, the center-degree cap as hub-skew
mitigation, and dirty-input tolerance."""

from __future__ import annotations

from openie_spark.operators.linkpred import linkpred_scores


def _scores(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {(r["a"], r["b"]): r for r in linkpred_scores(df, **kw).collect()}


def test_chain_distance2_pairs(spark):
    """Path 0-1-2-3-4: candidates are exactly the distance-2 pairs, each
    with cn=1; micro-Jaccard is exact integral division."""
    edges = [(i, i + 1) for i in range(4)]
    got = _scores(spark, edges)
    assert set(got) == {(0, 2), (1, 3), (2, 4)}
    # (0,2): deg0=1, deg2=2 -> 1e6*1 div (1+2-1) = 500000
    assert got[(0, 2)]["cn"] == 1 and got[(0, 2)]["jaccard_micro"] == 500_000
    # (1,3): deg1=deg3=2 -> 1e6 div 3 = 333333
    assert got[(1, 3)]["jaccard_micro"] == 333_333


def test_square_diagonals_share_two(spark):
    """4-cycle 0-1-2-3-0: each diagonal pair shares both its neighbors
    (cn=2, union=2 -> Jaccard exactly 1)."""
    got = _scores(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert set(got) == {(0, 2), (1, 3)}
    for k in got:
        assert got[k]["cn"] == 2 and got[k]["jaccard_micro"] == 1_000_000


def test_clique_fully_adjacent_no_candidates(spark):
    """Every pair in a clique is an edge — the anti-join removes all."""
    n = 6
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    assert _scores(spark, edges) == {}


def test_center_degree_cap_excludes_hub(spark):
    """A 100-leaf star: with the cap below the hub degree no leaf-leaf
    pair is emitted (the C(100,2) fan-out never materializes); raising
    the cap past the hub degree brings them back."""
    edges = [(0, i) for i in range(1, 101)]
    assert _scores(spark, edges, max_center_degree=64) == {}
    wide = _scores(spark, edges, max_center_degree=128)
    assert len(wide) == 100 * 99 // 2
    # leaf pair: cn=1, degrees 1 and 1 -> union 1 -> Jaccard 1.0
    assert wide[(1, 2)]["jaccard_micro"] == 1_000_000


def test_dirty_input_tolerated(spark):
    """Dups, self-loops, and mixed orientation collapse to the clean
    adjacency before scoring."""
    clean = _scores(spark, [(0, 1), (1, 2)])
    dirty = _scores(
        spark, [(0, 1), (1, 0), (0, 1), (1, 2), (2, 2), (2, 1)]
    )
    assert clean == dirty and set(clean) == {(0, 2)}


def test_min_common_filters(spark):
    """min_common=2 drops cn=1 candidates (chain) but keeps cn=2
    (square diagonals)."""
    edges = [(i, i + 1) for i in range(4)] + [(10, 11), (11, 12), (12, 13), (13, 10)]
    got = _scores(spark, edges, min_common=2)
    assert set(got) == {(10, 12), (11, 13)}
