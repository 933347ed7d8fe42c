"""L4 SQL-oracle layer: replicate the driver's compare locally — every
oracle-checked ``queries()`` entry must match DuckDB on row-count, column
names, and order-insensitive values at sf0.01 (TESTDATA.md)."""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from openie_spark.plans.compare import canon as _canon
from openie_spark.plans.compare import driver_sort as _driver_sort

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


# canon/_driver_sort live in openie_spark/plans/compare.py (single home,
# shared with jobs/round_artifacts.py so the local gate and the recorded
# artifact can never diverge in strictness)

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


def test_canon_floats_are_bit_exact():
    """Regression: the canon must hash floats at FULL precision — a
    <1e-6 fork (e.g. a reassociated float reduction) must fail locally
    exactly as the driver's serialized value hash would."""
    a = pd.DataFrame({"v": np.array([1.0, 2.5], dtype="float64")})
    b = pd.DataFrame({"v": np.array([1.0 + 1e-9, 2.5], dtype="float64")})
    assert _canon(a) != _canon(b)
    assert _canon(a) == _canon(a.copy())
    # sign of zero is part of the serialized form
    z = pd.DataFrame({"v": np.array([0.0], dtype="float64")})
    nz = pd.DataFrame({"v": np.array([-0.0], dtype="float64")})
    assert _canon(z) != _canon(nz)


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
