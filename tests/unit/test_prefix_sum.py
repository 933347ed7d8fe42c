"""Bucketed two-phase prefix sum + PPS systematic sampling
(operators/prefix_sum.py): bit-equality with the naive global window,
bucket-width invariance, tiebreak totality, and the exact PPS count law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openie_spark.operators.prefix_sum import (
    bucketed_prefix_sum,
    pps_systematic_sample,
)


def _data(spark, n=500):
    """Deterministic keys with gaps and deterministic pseudo-random
    weights (hash-derived, positive)."""
    return (
        spark.range(n)
        .select(
            (F.col("id") * 7 % 1000).alias("k"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(97)) + 1).alias("w"),
        )
        .withColumn("k", F.col("k") * 3)  # gaps
    )


def _naive(df, key, w):
    win = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("cum", F.sum(w).over(win).cast("long"))


@pytest.mark.parametrize("width", [1, 16, 64, 10_000])
def test_matches_naive_global_window(spark, width):
    df = _data(spark)
    got = {
        r["k"]: r["cum"]
        for r in bucketed_prefix_sum(df, "k", "w", width).collect()
    }
    want = {r["k"]: r["cum"] for r in _naive(df, "k", "w").collect()}
    assert got == want


def test_tiebreak_makes_duplicate_keys_total(spark):
    """Duplicate keys with a tiebreak column: the (key, tie) order is
    total, so the result is deterministic and equals the naive window."""
    rows = [(1, 0, 10), (1, 1, 20), (0, 0, 5), (2, 0, 7), (1, 2, 1)]
    df = spark.createDataFrame(rows, "k bigint, tie bigint, w bigint")
    got = {
        (r["k"], r["tie"]): r["cum"]
        for r in bucketed_prefix_sum(df, "k", "w", 2, tiebreak_cols=["tie"]).collect()
    }
    win = Window.orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["k"], r["tie"]): r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(win).cast("long")).collect()
    }
    assert got == want


def test_reserved_column_guard(spark):
    df = spark.createDataFrame([(1, 2)], "k bigint, _bkt bigint")
    with pytest.raises(ValueError, match="reserved"):
        bucketed_prefix_sum(df, "k", "_bkt", 4)


def test_pps_exact_count_law(spark):
    """Sum of multiplicities == number of stride multiples in [1, total]
    == total div stride — exact, not approximate."""
    df = _data(spark)
    out = pps_systematic_sample(df, "k", "w", n_samples=50, bucket_width=64)
    rows = out.collect()
    total = df.agg(F.sum("w")).collect()[0][0]
    stride = max(1, total // 50)
    assert sum(r["n_hits"] for r in rows) == total // stride
    assert all(r["n_hits"] >= 1 for r in rows)


def test_pps_heavy_row_multiplicity(spark):
    """A row heavier than the stride is drawn with multiplicity > 1."""
    rows = [(i, 1) for i in range(100)] + [(100, 1000)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    out = {
        r["k"]: r["n_hits"]
        for r in pps_systematic_sample(df, "k", "w", 10, bucket_width=16).collect()
    }
    # total=1100, stride=110: the planted heavy row covers (100, 1100]
    # -> hits at 110..1100 step 110 minus those <= 100 -> 9 or 10
    assert out[100] >= 9
