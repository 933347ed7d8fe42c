"""ParquetCatalog implementation-specific pins (catalog.py).  The
format-agnostic seam semantics (overwrite / dynamic partition-overwrite /
append / lifecycle / compaction row-preservation) live in
test_catalog_contract.py and run against ANY catalog impl; this file pins
what is parquet-specific: physical file-count reduction, the compaction
refusal guards, and the two-rename swap's crash recovery."""

from __future__ import annotations

from pathlib import Path

import pytest

from openie_spark.catalog import ParquetCatalog


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    """64 tiny files -> a handful of ~target-size files, byte-identical
    row set, old generation cleaned up."""
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
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    cat.write_bucketed(df, "bkt_compact_t", ["k"], 4)
    try:
        with pytest.raises(ValueError, match="bucketed"):
            cat.compact("bkt_compact_t")
    finally:
        cat.drop_table("bkt_compact_t")


def test_compact_refuses_partitioned_tables(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 3 AS p")
    cat.write_table(df, "part_t", partition_by=["p"])
    with pytest.raises(ValueError, match="partitioned"):
        cat.compact("part_t")


def _simulate_crash_mid_swap(tmp_path, table: str) -> None:
    """Reproduce the state a crash between ``src.rename(old)`` and
    ``tmp.rename(src)`` leaves behind: table path absent, original data
    under __precompact, staged copy under __compacting."""
    src = tmp_path / table
    (tmp_path / f"{table}__compacting").mkdir()
    src.rename(tmp_path / f"{table}__precompact")


def test_compact_crash_mid_swap_recovers_on_read(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(1_000).selectExpr("id", "id * 3 AS v")
    cat.write_table(df, "t")
    want = _rows(cat.load_table("t"))

    _simulate_crash_mid_swap(tmp_path, "t")
    assert not (tmp_path / "t").exists()  # the stranded state

    # exists() restores the precompact generation and discards the stage
    assert cat.exists("t")
    assert _rows(cat.load_table("t")) == want
    assert not (tmp_path / "t__precompact").exists()
    assert not (tmp_path / "t__compacting").exists()


def test_compact_crash_mid_swap_recovers_on_recompact(spark, tmp_path):
    """A re-run compact() after the crash restores, then compacts."""
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(2_000).selectExpr("id", "id * 3 AS v")
    df.repartition(16).write.parquet(str(tmp_path / "t"))
    want = _rows(spark.read.parquet(str(tmp_path / "t")))

    _simulate_crash_mid_swap(tmp_path, "t")
    n_after = cat.compact("t", target_file_bytes=64 * 1024)
    assert n_after >= 1
    assert _rows(cat.load_table("t")) == want


def test_stale_precompact_next_to_live_table_is_cleaned(spark, tmp_path):
    """Crash AFTER the second rename but before cleanup: live table plus
    a leftover __precompact.  Reads serve the live table and remove the
    stale generation."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write_table(spark.createDataFrame([(1,)], "x int"), "t")
    stale = tmp_path / "t__precompact"
    stale.mkdir()
    (stale / "junk.parquet").write_bytes(b"not-really-parquet")
    assert cat.exists("t")
    assert _rows(cat.load_table("t")) == [(1,)]
    assert not stale.exists()


def test_drop_table_removes_stranded_compaction_siblings(spark, tmp_path):
    """drop_table must also delete __precompact/__compacting siblings —
    otherwise the next read-path _recover_compact would rename a stranded
    __precompact back into place, resurrecting the dropped table."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write_table(spark.range(100).selectExpr("id", "id * 2 AS v"), "t")
    _simulate_crash_mid_swap(tmp_path, "t")  # t gone, t__precompact live

    cat.drop_table("t")
    assert not (tmp_path / "t__precompact").exists()
    assert not (tmp_path / "t__compacting").exists()
    assert not cat.exists("t")  # no resurrection on the read path
    assert not (tmp_path / "t").exists()
