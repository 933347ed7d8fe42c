"""Bucketed co-located joins (SURVEY.md §4 partitioning strategy): two
tables bucketed by the same key into the same bucket count must join with
NO shuffle exchange on either side — the plan-level proof that the catalog's
bucketed write path delivers the 100 TB amortized-shuffle strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openie_spark.catalog import ParquetCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = ParquetCatalog(spark, str(tmp_path / "bkt"))
    yield c
    for t in ("bkt_mentions", "bkt_links"):
        c.drop_table(t)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, cat):
    a = spark.range(0, 10_000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("va")
    )
    b = spark.range(0, 5_000).select(
        (F.col("id") % 997).alias("k"), (F.col("id") * 2).alias("vb")
    )
    cat.write_bucketed(a, "bkt_mentions", ["k"], 8)
    cat.write_bucketed(b, "bkt_links", ["k"], 8)

    ta = cat.load_bucketed("bkt_mentions")
    tb = cat.load_bucketed("bkt_links")
    # force the sort-merge path so the assertion is about bucketing, not
    # about a broadcast happening to hide the shuffle
    joined = ta.hint("merge").join(tb, "k")
    joined.write.format("noop").mode("overwrite").save()
    plan = _plan(joined)
    assert "Exchange" not in plan, plan  # bucketing removed BOTH shuffles
    assert "SortMergeJoin" in plan

    # correctness: equals the plain (shuffled) join
    plain = a.join(b, "k")
    assert joined.count() == plain.count()
    got = {(r["k"], r["va"], r["vb"]) for r in joined.collect()}
    want = {(r["k"], r["va"], r["vb"]) for r in plain.collect()}
    assert got == want


def test_unbucketed_reread_would_shuffle(spark, cat):
    """Reading the same files WITHOUT the catalog metadata reintroduces the
    exchange — pinning why load_bucketed must go through spark.table."""
    a = spark.range(0, 2_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("va")
    )
    cat.write_bucketed(a, "bkt_mentions", ["k"], 4)
    cat.write_bucketed(a.withColumnRenamed("va", "vb"), "bkt_links", ["k"], 4)
    raw_a = spark.read.parquet(cat._path("bkt_mentions"))
    raw_b = spark.read.parquet(cat._path("bkt_links"))
    j = raw_a.hint("merge").join(raw_b, "k")
    j.write.format("noop").mode("overwrite").save()
    assert "Exchange" in _plan(j)
