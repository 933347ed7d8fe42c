"""ParquetCatalog semantics (catalog.py): dynamic partition-overwrite is
the exactly-once guarantee behind stage re-materialization — a re-executed
partition must replace ONLY its own previous output.  These tests pin that
behavior directly (the e2e resume tests exercise it indirectly)."""

from __future__ import annotations

from openie_spark.catalog import ParquetCatalog


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_partial_rewrite_leaves_other_partitions_intact(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    full = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "partition_id int, v string"
    )
    cat.write_table(full, "t", partition_by=["partition_id"])
    # re-execute ONLY partition 1 with different content
    redo = spark.createDataFrame([(1, "c2")], "partition_id int, v string")
    cat.write_table(redo, "t", partition_by=["partition_id"])
    got = _rows(cat.load_table("t").select("partition_id", "v"))
    assert got == [(0, "a"), (0, "b"), (1, "c2")]


def test_rewrite_same_partition_does_not_duplicate(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame([(0, "a"), (1, "b")], "partition_id int, v string")
    cat.write_table(df, "t", partition_by=["partition_id"])
    cat.write_table(df, "t", partition_by=["partition_id"])  # idempotent rerun
    assert _rows(cat.load_table("t").select("partition_id", "v")) == [
        (0, "a"),
        (1, "b"),
    ]


def test_unpartitioned_write_is_full_overwrite(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    cat.write_table(spark.createDataFrame([(1,)], "x int"), "t")
    cat.write_table(spark.createDataFrame([(2,)], "x int"), "t")
    assert _rows(cat.load_table("t")) == [(2,)]


def test_exists_and_drop(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    assert not cat.exists("t")
    cat.write_table(spark.createDataFrame([(1,)], "x int"), "t")
    assert cat.exists("t")
    cat.drop_table("t")
    assert not cat.exists("t")


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    """64 tiny files -> a handful of ~target-size files, byte-identical
    row set, old generation cleaned up."""
    from pathlib import Path

    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(str(tmp_path / "t"))
    before = len(list((tmp_path / "t").glob("**/*.parquet")))
    assert before == 64

    want = _rows(spark.read.parquet(str(tmp_path / "t")))
    n_after = cat.compact("t", target_file_bytes=64 * 1024)
    files = list((tmp_path / "t").glob("**/*.parquet"))
    assert len(files) == n_after < before
    assert _rows(cat.load_table("t")) == want
    assert not (tmp_path / "t__compacting").exists()
    assert not (tmp_path / "t__precompact").exists()


def test_compact_refuses_bucketed_tables(spark, tmp_path):
    import pytest

    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    cat.write_bucketed(df, "bkt_compact_t", ["k"], 4)
    try:
        with pytest.raises(ValueError, match="bucketed"):
            cat.compact("bkt_compact_t")
    finally:
        cat.drop_table("bkt_compact_t")


def test_compact_refuses_partitioned_tables(spark, tmp_path):
    import pytest

    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 3 AS p")
    cat.write_table(df, "part_t", partition_by=["p"])
    with pytest.raises(ValueError, match="partitioned"):
        cat.compact("part_t")
