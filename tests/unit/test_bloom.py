"""Bloom pre-join pruning (functions/bloom.py): no false negatives,
bit-equality of pruned vs plain semi join, actual pruning effectiveness,
and codegen-friendliness (probe is a pure expression, no UDF fence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.functions.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
)


def test_no_false_negatives(spark):
    keys = spark.createDataFrame([(i * 13,) for i in range(200)], "k bigint")
    bf = build_bloom(keys, "k", m_bits=1 << 14, k=5)
    hits = keys.where(might_contain(bf, F.col("k"))).count()
    assert hits == 200  # every inserted key must probe true


def test_prunes_most_non_members(spark):
    small = spark.createDataFrame([(i,) for i in range(100)], "k bigint")
    big = spark.range(0, 50_000).select((F.col("id") + 1_000_000).alias("k"))
    bf = build_bloom(small, "k", m_bits=1 << 17, k=5)
    survivors = big.where(might_contain(bf, F.col("k"))).count()
    # fp rate at n=100, m=128k, k=5 is ~0 — allow a generous bound
    assert survivors < 500


def test_semi_join_equality_with_plain_join(spark):
    small = spark.createDataFrame(
        [(i * 7,) for i in range(50)], "k bigint"
    )
    big = spark.range(0, 2_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    got = sorted(map(tuple, bloom_semi_join(big, small, "k").collect()))
    want = sorted(
        map(tuple, big.join(small.distinct(), "k", "left_semi").collect())
    )
    assert got == want and len(got) > 0


def test_string_keys(spark):
    small = spark.createDataFrame([(f"id-{i}",) for i in range(30)], "k string")
    big = spark.createDataFrame(
        [(f"id-{i}",) for i in range(100)] + [("zzz",)], "k string"
    )
    got = sorted(r["k"] for r in bloom_semi_join(big, small, "k").collect())
    assert got == sorted(f"id-{i}" for i in range(30))


def test_probe_has_no_python_fence(spark):
    small = spark.createDataFrame([(1,), (2,)], "k bigint")
    big = spark.range(0, 100).select(F.col("id").alias("k"))
    bf = build_bloom(small, "k", m_bits=1 << 10, k=3)
    plan = big.where(might_contain(bf, F.col("k")))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_duplicate_and_null_safety(spark):
    small = spark.createDataFrame([(5,), (5,), (None,)], "k bigint")
    big = spark.createDataFrame([(5,), (6,), (None,)], "k bigint")
    got = [r["k"] for r in bloom_semi_join(big, small, "k").collect()]
    # null keys never match an equi-join; 5 matches once
    assert got == [5]
