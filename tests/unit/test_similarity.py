"""L1 unit tests for similarity search (operators/similarity.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType, LongType, StructField, StructType

from openie_spark.operators.similarity import (
    SRP_DIM,
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    srp_topk,
)

N, DIM, K = 60, 16, 5

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)


@pytest.fixture(scope="module")
def vectors() -> np.ndarray:
    rng = np.random.default_rng(7)
    v = rng.standard_normal((N, DIM)).astype(np.float32)
    v[1] = v[0]  # planted exact duplicate pair (0, 1)
    v[2] = v[0] + np.float32(0.01) * rng.standard_normal(DIM).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def emb(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, EMB_SCHEMA)


def _np_topk(vectors: np.ndarray, qi: int, k: int) -> list[int]:
    v = vectors.astype(np.float64)
    sims = v @ v[qi] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[qi]))
    order = sorted((i for i in range(N) if i != qi), key=lambda i: (-sims[i], i))
    return order[:k]


def test_brute_force_matches_numpy(spark, emb, vectors):
    probes = emb.where(F.col("vec_id").isin([0, 7, 23]))
    got = (
        brute_force_topk(emb, probes, k=K)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q: dict[int, list[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qi in (0, 7, 23):
        assert by_q[qi] == _np_topk(vectors, qi, K)


def test_brute_force_plan_is_broadcast(spark, emb):
    probes = emb.where(F.col("vec_id") == 0)
    plan = brute_force_topk(emb, probes)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # probe set broadcast, corpus scanned once
    assert "SortMergeJoin" not in plan


def test_srp_finds_planted_duplicates(spark, emb):
    """Identical vectors share every SRP bucket → the duplicate must be
    retrieved as the top-1 neighbor; the 1%-perturbed copy should appear
    in the candidate top-k too (sign bits nearly identical)."""
    probes = emb.where(F.col("vec_id") == 0)
    got = srp_topk(emb, probes, k=K, dim=DIM).orderBy("rank").collect()
    assert got[0]["neighbor_id"] == 1
    assert got[0]["cosine"] == pytest.approx(1.0)
    assert 2 in [r["neighbor_id"] for r in got]


def test_cosine_near_dup_pairs(spark, emb):
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           cosine_near_dup_pairs(emb, 0.95, dim=DIM).collect()}
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in got  # 1% perturbation keeps cosine > 0.95
    for (a, b), c in got.items():
        assert c >= 0.95 and a < b


def test_srp_default_dim_matches_driver_table(spark):
    """The frozen default SRP_DIM must match the driver embeddings table."""
    assert SRP_DIM == 64


def test_ivf_finds_planted_duplicates(spark, emb):
    """Identical vectors are assigned the identical cell → the exact
    duplicate must come back as top-1; the 1%-perturbed copy shares the
    nearest centroid too."""
    probes = emb.where(F.col("vec_id") == 0)
    got = ivf_topk(emb, probes, k=K).orderBy("rank").collect()
    assert got[0]["neighbor_id"] == 1
    assert got[0]["cosine"] == pytest.approx(1.0)
    assert 2 in [r["neighbor_id"] for r in got]


def test_ivf_plan_no_cartesian(spark, emb):
    probes = emb.where(F.col("vec_id") == 0)
    plan = (
        ivf_topk(emb, probes, k=K)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def _recall_vs_brute(spark, emb, vectors, method, probe_ids) -> float:
    probes = emb.where(F.col("vec_id").isin(probe_ids))
    got = method(emb, probes, k=K).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        len(by_q.get(qi, set()) & set(_np_topk(vectors, qi, K)))
        for qi in probe_ids
    )
    return hits / (len(probe_ids) * K)


def test_ivf_recall_at_least_srp(spark, emb, vectors):
    """The centroid-blocked IVF path must retrieve at least as much of the
    exact top-k as the data-oblivious SRP path on this corpus (the reason
    it exists as the second scale path)."""
    probe_ids = [0, 7, 13, 23, 31, 47]
    r_ivf = _recall_vs_brute(spark, emb, vectors, ivf_topk, probe_ids)
    r_srp = _recall_vs_brute(
        spark, emb, vectors, lambda c, q, k: srp_topk(c, q, k=k, dim=DIM), probe_ids
    )
    assert r_ivf > 0
    assert r_ivf >= r_srp


def test_srp_batch_keys_match_scalar(vectors):
    """The vectorized SRP band-key kernel (one batch matmul + bit-pack)
    must be bit-identical to the scalar oracle path, including null /
    wrong-dimension rows (→ no keys)."""
    from openie_spark.operators.similarity import (
        _hyperplanes,
        _srp_keys_batch,
        srp_keys_scalar,
    )

    planes = _hyperplanes(DIM)
    vecs = [list(map(float, v)) for v in vectors[:20]]
    vecs += [None, [], [1.0, 2.0]]  # null + wrong-dim rows
    got = _srp_keys_batch(planes, vecs)
    for i, v in enumerate(vecs):
        if v is None or len(v) != DIM:
            assert got[i] == []
        else:
            assert got[i] == srp_keys_scalar(v, DIM)



# --- int8 scalar quantization (quantize_embeddings) ---------------------


def test_quantize_range_and_extremes(spark):
    from openie_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in quantize_embeddings(df, "embedding").collect()
    }
    q1 = rows[1]["q_vec"]
    assert rows[1]["scale_milli"] == 1000
    # max-abs element maps to +-127 exactly; others scale linearly
    assert q1 == [63, -127, 31, 0]  # (500*127)//1000, -(1000*127)//1000, ...
    assert all(-127 <= v <= 127 for v in q1)
    # zero vector: scale 0, all-zero quantization (no division by zero)
    assert rows[2]["scale_milli"] == 0 and rows[2]["q_vec"] == [0, 0, 0, 0]


def test_quantize_sign_symmetry(spark):
    from openie_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.7, -0.7, 0.123, -0.123])], "vec_id int, embedding array<double>"
    )
    q = quantize_embeddings(df, "embedding").collect()[0]["q_vec"]
    assert q[0] == -q[1] and q[2] == -q[3]


def test_quantize_reconstruction_error_bound(spark):
    from openie_spark.operators.similarity import quantize_embeddings

    vals = [0.913, -0.211, 0.007, 0.499, -0.999, 0.361]
    df = spark.createDataFrame(
        [(1, vals)], "vec_id int, embedding array<double>"
    )
    r = quantize_embeddings(df, "embedding").collect()[0]
    s = r["scale_milli"]
    for x, qv in zip(vals, r["q_vec"]):
        # dequantized value within one quantization step of the milli input
        assert abs(round(x * 1000) - qv * s / 127) <= s / 127 + 1e-9


def test_quantize_no_python_fence(spark):
    from openie_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id int, embedding array<double>"
    )
    plan = (
        quantize_embeddings(df, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_int8_topk_exact_small_case(spark):
    from openie_spark.operators.similarity import int8_topk

    # 4 corpus vectors in 2D; query = [1, 0] (vec_id 0)
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # most aligned
        (2, [0.0, 1.0]),   # orthogonal
        (3, [-1.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    probes = df.where("vec_id = 0")
    got = [
        (r["neighbor_id"], r["rnk"])
        for r in int8_topk(df, probes, k=3).orderBy("rnk").collect()
    ]
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_int8_topk_agrees_with_float_bruteforce_topk(spark):
    from openie_spark.operators.similarity import brute_force_topk, int8_topk

    import math
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    probes = df.where("vec_id % 20 = 0")
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in int8_topk(df, probes, k=5).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, probes, k=5).collect()
    }
    # int8 IP vs float cosine: different metrics (no normalization), so
    # perfect agreement is not expected — but on random vectors the top-5
    # sets should overlap substantially (quantization error ~1/127)
    assert len(got & want) >= int(0.5 * len(want))
    assert len(got) == len(want) == 4 * 5
