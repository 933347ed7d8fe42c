"""Driver-strength result compare — SINGLE HOME (CLAUDE.md rule).

Replicates the driver's CORRECTNESS harness locally: order-insensitive,
column-name-sorted, **dtype-strict** value canonicalization of a pandas
frame.  Both the pytest parity gate (tests/sql/test_oracle_parity.py) and
the `make round` artifact job (jobs/round_artifacts.py) import from here,
so the local gate can never drift weaker than the recorded artifact
again (the r3 ``train_val_split`` failure mode: Python's lax
``123456 == 123456.0`` passed locally while the driver's serializing
hash failed).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


def driver_sort(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver canonicalizer's entry step: pandas
    ``sort_values`` over EVERY column.  Raises ``TypeError: unhashable
    type`` on list/dict cells exactly like the driver harness — any query
    emitting complex-typed columns fails locally first."""
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df


def tagged(v):
    """Dtype-strict cell canonicalization.  The driver hashes *serialized*
    values, so ``123456`` (Spark BIGINT) vs ``123456.0`` (DuckDB
    HUGEINT→float64) MUST mismatch here too.  Each value is tagged with
    its broad kind (bool/int/float/time/bytes/str) so cross-kind equality
    is impossible, while width differences within a kind (int32 vs int64)
    still compare equal, matching the driver's serialized form."""
    if v is None:
        return ("none",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        # BIT-exact: the driver hashes serialized full-precision values, so
        # rounding here would pass a <1e-6 fork locally that the driver
        # fails.  float.hex() round-trips every double exactly (and keeps
        # -0.0 distinct from 0.0, like any serialized form).
        fv = float(v)
        return ("f", "nan") if math.isnan(fv) else ("f", fv.hex())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def canon(df: pd.DataFrame) -> list[tuple]:
    df = driver_sort(df)
    df = df[sorted(df.columns)]
    rows = [tuple(tagged(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(repr(canon(df)).encode()).hexdigest()


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    """One CORRECTNESS row, driver-shaped: rows/schema/hash matches."""
    out = {
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "hash_match": None,
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "err": None,
    }
    out["hash_match"] = (
        out["rows_match"]
        and out["schema_match"]
        and value_hash(spark_pdf) == value_hash(oracle_pdf)
    )
    return out
