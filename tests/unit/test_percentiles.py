"""Bounded-state exact discrete percentiles (operators/percentiles.py):
equality with a pure-Python percentile_disc twin across ties, skewed
groups, and boundary fractions.  Cross-engine parity for the registry
queries is tests/sql/test_oracle_parity.py (value_percentiles /
value_mad keep percentile_disc on the DuckDB side on purpose)."""

from __future__ import annotations

import random

from openie_spark.operators.percentiles import disc_percentiles


def _disc(vals: list[int], num: int, den: int) -> int:
    """percentile_disc(num/den): the value at 1-indexed position
    ceil(p * n) of the sorted multiset."""
    s = sorted(vals)
    pos = -(-num * len(s) // den)  # ceil
    return s[max(pos, 1) - 1]


def _run(spark, rows, ps):
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = disc_percentiles(df, ["g"], "v", ps).collect()
    return {r["g"]: r for r in out}


def test_matches_python_twin_with_ties_and_skew(spark):
    rng = random.Random(7)
    rows = []
    groups = {
        "a": [rng.randint(-5, 5) for _ in range(37)],  # heavy ties
        "b": [rng.randint(-10**6, 10**6) for _ in range(101)],
        "c": [42],  # single row
        "d": [1, 1, 1, 1],  # all identical
    }
    for g, vs in groups.items():
        rows += [(g, v) for v in vs]
    ps = {"p50": (1, 2), "p90": (9, 10), "p100": (1, 1)}
    got = _run(spark, rows, ps)
    for g, vs in groups.items():
        r = got[g]
        assert r["n"] == len(vs)
        assert r["p50"] == _disc(vs, 1, 2), g
        assert r["p90"] == _disc(vs, 9, 10), g
        assert r["p100"] == max(vs), g
        assert r["v_min"] == min(vs) and r["v_max"] == max(vs)


def test_deterministic_across_parallelism(spark):
    rows = [("g", (i * 37) % 11 - 5) for i in range(50)]
    df1 = spark.createDataFrame(rows, "g string, v bigint").repartition(1)
    df8 = spark.createDataFrame(rows, "g string, v bigint").repartition(8)
    ps = {"p50": (1, 2), "p25": (1, 4)}
    a = disc_percentiles(df1, ["g"], "v", ps).collect()
    b = disc_percentiles(df8, ["g"], "v", ps).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_null_values_match_percentile_disc_semantics(spark):
    """NULLs are excluded from the percentile multiset and min/max but
    counted in n (COUNT(*) parity with the registry oracles) — the exact
    engine-native semantics, pinned so a nullable value column cannot
    fork this spelling from percentile_disc."""
    rows = [("a", 1), ("a", 2), ("a", 3), ("a", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    out = {r["g"]: r for r in disc_percentiles(df, ["g"], "v", {"p50": (1, 2)}).collect()}
    a = out["a"]
    assert (a["n"], a["p50"], a["v_min"], a["v_max"]) == (4, 2, 1, 3)
    b = out["b"]  # all-null group: count kept, value stats NULL
    assert b["n"] == 2
    assert b["p50"] is None and b["v_min"] is None and b["v_max"] is None
    # cross-engine: same frame through DuckDB's percentile_disc, compared
    # via the ONE-home dtype-strict canon (never hand-roll a value
    # compare — an int vs float64 fork must mismatch)
    import duckdb

    from openie_spark.plans.compare import compare_frames

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a',1),('a',2),('a',3),"
        "('a',NULL),('b',NULL),('b',NULL)) AS v(g, x)"
    )
    oracle = con.execute(
        "SELECT g, CAST(COUNT(*) AS BIGINT) AS n,"
        " percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS p50,"
        " MIN(x) AS v_min, MAX(x) AS v_max FROM t GROUP BY g ORDER BY g"
    ).df()
    got = (
        disc_percentiles(df, ["g"], "v", {"p50": (1, 2)}).orderBy("g").toPandas()
    )
    res = compare_frames(got, oracle)
    assert res["hash_match"], res
