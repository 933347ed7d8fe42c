"""Semantic gates for SemDeDup pruning (operators/semdedup.py): the
near-pair rule and the farthest-from-centroid / id-tie-break dominance
on hand-built vectors.  Cross-engine parity is
tests/sql/test_oracle_parity.py; these pin the SEMANTICS."""

from __future__ import annotations

from openie_spark.operators.semdedup import semantic_prune


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _basis(i, scale=1.0, dim=64):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_duplicate_pair_prunes_exactly_one(spark):
    # 8 mutually-orthogonal vectors (cos = 0 -> never near) + one
    # identical pair on a ninth axis (cos = 1 -> near).
    rows = [(i, _basis(i, 1.0 + i * 0.1)) for i in range(8)]
    rows += [(8, _basis(10, 2.0)), (9, _basis(10, 2.0))]
    out = {r["vec_id"]: r for r in semantic_prune(_vecs(spark, rows)).collect()}
    assert len(out) == 10
    # identical vectors: same cluster, same dist -> the id tie-break
    # keeps the smaller id and prunes the larger, exactly one of the two
    assert out[8]["cluster"] == out[9]["cluster"]
    assert out[8]["dist"] == out[9]["dist"]
    assert (out[8]["n_neighbors"], out[8]["pruned"]) == (1, 0)
    assert (out[9]["n_neighbors"], out[9]["pruned"]) == (1, 1)
    # orthogonal vectors are never near and never pruned
    for i in range(8):
        assert (out[i]["n_neighbors"], out[i]["pruned"]) == (0, 0)


def test_every_near_neighborhood_keeps_a_survivor(spark):
    # three colinear vectors (pairwise cos = 1): the dominance rule must
    # keep at least one and prune the rest deterministically
    rows = [(i, _basis(i, 1.0)) for i in range(8)]
    rows += [(20, _basis(12, 1.0)), (21, _basis(12, 2.0)), (22, _basis(12, 3.0))]
    out = {r["vec_id"]: r for r in semantic_prune(_vecs(spark, rows)).collect()}
    trio = [out[i] for i in (20, 21, 22)]
    assert all(r["n_neighbors"] == 2 for r in trio)
    kept = [r["vec_id"] for r in trio if r["pruned"] == 0]
    # the keeper is the member farthest from the shared centroid (max
    # dist, id tie-break) — and exactly one member survives here because
    # all three are mutually near
    assert len(kept) == 1
    best = max(trio, key=lambda r: (r["dist"], -r["vec_id"]))
    assert kept == [best["vec_id"]]


def test_scale_knob_is_callable_and_bounds_clusters(spark):
    """The SemDeDup scale knob: a small target_cluster_size forces more
    clusters (k = ceil(n/target) past the KMEANS_K floor), and passing
    the equivalent explicit k is bit-identical — the knob is a real
    parameter wired through to the clustering, not a doc note."""
    from openie_spark.operators.kmeans import adaptive_k

    rows = [(i, _basis(i % 24, 1.0 + (i % 5) * 0.25)) for i in range(30)]
    v = _vecs(spark, rows)
    k = adaptive_k(30, 2)  # = max(8, 15) = 15
    assert k == 15
    knob = semantic_prune(v, target_cluster_size=2).collect()
    explicit = semantic_prune(v, k=15).collect()
    assert [tuple(r) for r in knob] == [tuple(r) for r in explicit]
    assert len({r["cluster"] for r in knob}) <= 15
