"""Pin the exact-integer-division twin (CLAUDE.md invariant: iterative
oracle-checked ops use ``div`` in Spark and ``//`` in DuckDB).

Probed here across ALL sign combinations: Spark's ``div`` and DuckDB's
``//`` BOTH truncate toward zero, so the pair is safe on any operand sign.
Python's ``//`` however FLOORS — it forks from both engines on mixed-sign
operands (-7 // 2: Python -4, Spark/DuckDB -3).  Every pure-Python twin
fixture therefore either keeps its operands provably non-negative (the
blocking-twin ppm ratios, scale chunking) or must spell truncation
explicitly (``int(a / b)`` is NOT it either — float precision; use
``abs`` sign-splitting or ``math.trunc`` on the exact Fraction).  This
gate keeps the fork documented and fails if either engine changes."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

CASES = [(7, 2), (-7, 2), (7, -2), (-7, -2), (1_000_001, 7), (-1_000_001, 7), (0, 5)]


def test_spark_div_equals_duckdb_intdiv_all_signs(spark):
    df = spark.createDataFrame(CASES, "a long, b long").select(
        "a", "b", F.expr("a div b").alias("q")
    )
    con = duckdb.connect()
    for r in df.collect():
        dd = con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT)", [r["a"], r["b"]]
        ).fetchone()[0]
        assert r["q"] == dd, (r["a"], r["b"], r["q"], dd)
        # both truncate toward zero == Python's int(Fraction) truncation
        import math
        from fractions import Fraction

        assert r["q"] == math.trunc(Fraction(r["a"], r["b"])) if r["b"] else True


def test_python_floor_div_forks_on_mixed_signs():
    # the documented trap: if this ever stops holding, the comment in the
    # twin fixtures about non-negative operands is stale
    assert -7 // 2 == -4
    assert duckdb.sql("SELECT -7 // 2").fetchone()[0] == -3
