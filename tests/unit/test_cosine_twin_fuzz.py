"""Seeded fuzz gate for the float32 cosine twin (CLAUDE.md invariant:
Spark ``zip_with(a, b, x*y)`` on array<float> multiplies in FLOAT32 and
``aggregate(..., 0D, acc+v)`` accumulates in DOUBLE, in array order).

gen_ann_twin._cosine_f32 replays that arithmetic single-process and every
ANN/near-dup oracle fixture rides it; until now the equivalence was only
pinned transitively (the oracle sweep hash-matching on the 64-dim corpus).
This file compares the SHIPPED pair — operators.similarity.cosine_col vs
gen_ann_twin._cosine_f32 — bit-exactly on a few hundred seeded random
vector pairs across dims 1..96, plus the adversarial shapes float32
actually exercises: magnitude spreads that force product rounding,
cancellation-heavy alternating signs, subnormal-scale values, exact-zero
elements, and identical vectors (cosine must land exactly where the twin
lands, NOT at 1.0 by construction)."""

from __future__ import annotations

import math
import struct

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from openie_spark.fixtures.gen_ann_twin import _cosine_f32
from openie_spark.operators.similarity import cosine_col


def _pairs(seed: int) -> list[tuple[list[float], list[float]]]:
    rng = np.random.default_rng(seed)
    out = []
    for dim in (1, 2, 3, 7, 8, 17, 64, 96):
        for _ in range(12):
            a = rng.standard_normal(dim).astype(np.float32)
            b = rng.standard_normal(dim).astype(np.float32)
            out.append((a.tolist(), b.tolist()))
        # magnitude spread: products round differently in f32 vs f64
        a = (rng.standard_normal(dim) * 10.0 ** rng.integers(-6, 7, dim)).astype(
            np.float32
        )
        b = (rng.standard_normal(dim) * 10.0 ** rng.integers(-6, 7, dim)).astype(
            np.float32
        )
        out.append((a.tolist(), b.tolist()))
        # cancellation: alternating near-equal terms
        a = np.resize(np.array([1e6, -1e6, 1.0], dtype=np.float32), dim)
        b = np.resize(np.array([1.0, 1.0, 1.0], dtype=np.float32), dim)
        out.append((a.tolist(), b.tolist()))
        # subnormal products (x*x ~ 1e-40 is f32-subnormal) + exact zeros,
        # but never a zero NORM: the twin's caller contract (like Spark's
        # near-dup callers) filters zero vectors before cosine
        a = (rng.standard_normal(dim) * 1e-20).astype(np.float32)
        if dim >= 3:
            a[dim // 3] = np.float32(0.0)
        if not float(np.sum(np.square(a, dtype=np.float32), dtype=np.float64)):
            a[0] = np.float32(1e-20)
        out.append((a.tolist(), (rng.standard_normal(dim).astype(np.float32)).tolist()))
        # identical vectors: dot/(na*nb) need not be exactly 1.0
        v = rng.standard_normal(dim).astype(np.float32).tolist()
        out.append((v, v))
    return out


def test_cosine_col_bit_identical_to_python_twin(spark):
    pairs = _pairs(seed=0xD07)
    schema = StructType(
        [
            StructField("a", ArrayType(FloatType())),
            StructField("b", ArrayType(FloatType())),
        ]
    )
    df = spark.createDataFrame(pairs, schema).select(
        "a", "b", cosine_col("a", "b").alias("c")
    )
    n_checked = 0
    for r in df.collect():
        a = np.asarray(r["a"], dtype=np.float32)
        b = np.asarray(r["b"], dtype=np.float32)
        twin = _cosine_f32(a, b)
        got = r["c"]
        if math.isnan(twin):
            assert got is None or math.isnan(got), (r["a"], r["b"], got)
        else:
            assert got is not None and struct.pack("<d", got) == struct.pack(
                "<d", twin
            ), (r["a"], r["b"], got, twin)
        n_checked += 1
    assert n_checked == len(pairs)


def test_cosine_zero_vector_both_sides_raise(spark):
    # all-zero vector: BOTH sides refuse the 0/0 rather than minting a
    # value — the twin's pure-Python float division raises
    # ZeroDivisionError, and Spark 4's ANSI mode raises DIVIDE_BY_ZERO.
    # Every caller filters zero vectors before cosine; pin the symmetric
    # refusal so a change on either side surfaces here, not as an oracle
    # mismatch.
    import pytest

    schema = StructType(
        [
            StructField("a", ArrayType(FloatType())),
            StructField("b", ArrayType(FloatType())),
        ]
    )
    z = [0.0, 0.0, 0.0]
    v = [1.0, 2.0, 3.0]
    df = spark.createDataFrame([(z, v)], schema).select(
        cosine_col("a", "b").alias("c")
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.collect()
    with pytest.raises(ZeroDivisionError):
        _cosine_f32(np.asarray(z, dtype=np.float32), np.asarray(v, dtype=np.float32))
