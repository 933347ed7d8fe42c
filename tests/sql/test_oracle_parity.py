"""L4 SQL-oracle layer: replicate the driver's compare locally — every
oracle-checked ``queries()`` entry must match DuckDB on row-count, column
names, and order-insensitive values at sf0.01 (TESTDATA.md)."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{Path(SF_DIR)}/{t}.parquet')"
        )
    return con.sql(sql).df()


def _driver_sort(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver's canonicalizer entry step: pandas
    ``sort_values`` over EVERY column.  This raises ``TypeError: unhashable
    type`` on list/dict cells exactly like the driver harness does — so any
    query emitting complex-typed columns fails locally first (the
    media_features class of round-1 failure)."""
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df


_CANON_UNSAFE_TYPES = ("array", "map", "struct")


def _assert_canon_safe_schema(df) -> None:
    """Every driver-compared output must be flat: no array/map/struct
    columns (the driver canonicalizer cannot hash them)."""
    bad = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in _CANON_UNSAFE_TYPES
    ]
    assert not bad, f"driver-canon-unsafe complex-typed columns: {bad}"


def _tagged(v):
    """Dtype-strict cell canonicalization.  The driver hashes *serialized*
    values, so ``123456`` (Spark BIGINT) vs ``123456.0`` (DuckDB
    HUGEINT→float64) MUST mismatch here too — Python's lax ``123456 ==
    123456.0`` let exactly that defect class (r3 ``train_val_split``) pass
    locally and fail the driver.  Each value is tagged with its broad kind
    (bool/int/float/time/bytes/str) so cross-kind equality is impossible,
    while width differences within a kind (int32 vs int64) still compare
    equal, matching the driver's serialized form."""
    if v is None:
        return ("none",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        fv = float(v)
        return ("f", "nan") if math.isnan(fv) else ("f", round(fv, 6))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = _driver_sort(df)
    df = df[sorted(df.columns)]
    rows = [tuple(_tagged(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    _assert_canon_safe_schema(df)
    sdf = df.toPandas()
    ddf = _duck(entrymod.oracle_sql()[name])
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        sorted(sdf.columns),
        sorted(ddf.columns),
    )
    assert len(sdf) == len(ddf), (len(sdf), len(ddf))
    a, b = _canon(sdf), _canon(ddf)
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"first mismatches at {mismatches}: " + "; ".join(
        f"{a[i]} != {b[i]}" for i in mismatches
    )


def test_canon_is_dtype_strict():
    """Regression for the r3 ``train_val_split`` defect class: a frame
    whose column came back int vs the same values as float64 (DuckDB
    HUGEINT promotion) must FAIL the local compare, exactly as the
    driver's serializing hash does."""
    ints = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 2], dtype="int64")})
    flts = pd.DataFrame({"k": ["a", "b"], "v": np.array([1.0, 2.0], dtype="float64")})
    assert _canon(ints) != _canon(flts)
    assert _canon(ints) == _canon(ints.copy())
    # bool-vs-int is likewise distinct (serialized True != 1)
    bools = pd.DataFrame({"k": ["a", "b"], "v": np.array([True, False])})
    zeroone = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 0], dtype="int64")})
    assert _canon(bools) != _canon(zeroone)


def test_rows_only_queries(spark):
    """Queries without oracle SQL must still run, return a stable schema,
    AND survive the driver's list-intolerant canonicalizer (replicated by
    _driver_sort over a row sample)."""
    qs = entrymod.queries()
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        _assert_canon_safe_schema(df)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
        _driver_sort(df.limit(50).toPandas())  # raises on unhashable cells
