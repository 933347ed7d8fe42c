"""L1 tests for temporal joins (operators/temporal.py): as-of semantics
(ties, no-match, inner mode) and banded interval containment (boundaries,
band-spanning intervals, no duplicate pairs) — plus the plan-shape gates
that make these the scale-safe formulations (no BroadcastNestedLoop /
cartesian anywhere)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.temporal import asof_join, interval_join_banded


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k bigint, ts bigint, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, 100, 11, "r11"),  # tie with left ts=100 → counts (<=)
            (1, 100, 12, "r12"),  # same ts tie → greatest tiebreak wins
            (1, 200, 13, "r13"),
            (2, 60, 21, "r21"),  # after left ts=50 → no match for 'c'
        ],
        "k bigint, rts bigint, rid bigint, rv string",
    )


def test_asof_semantics(spark):
    got = {
        (r["k"], r["tag"]): (r["rid"], r["rv"])
        for r in asof_join(
            _left(spark), _right(spark), "k", "ts", "rts", ["rid", "rv"],
            tiebreak=["rid"],
        ).collect()
    }
    assert got[(1, "a")] == (12, "r12")  # ts tie counts; greatest rid wins
    assert got[(1, "b")] == (13, "r13")  # latest earlier row
    assert got[(2, "c")] == (None, None)  # only future right rows
    assert got[(3, "d")] == (None, None)  # key absent on the right


def test_asof_null_right_values_do_not_mix_rows(spark):
    """The matched right row must be carried ATOMICALLY: when the newest
    right row has a NULL value column, per-column carry would splice in an
    older row's value — the struct carry must return the actual row."""
    left = spark.createDataFrame([(1, 100, "x")], "k bigint, ts bigint, tag string")
    right = spark.createDataFrame(
        [(1, 10, 5, "old"), (1, 20, None, "new")],
        "k bigint, rts bigint, a int, b string",
    )
    (row,) = asof_join(left, right, "k", "ts", "rts", ["a", "b"]).collect()
    assert (row["a"], row["b"]) == (None, "new")  # the ts=20 row, verbatim


def test_asof_null_right_ts_excluded(spark):
    """Right rows with NULL right_ts are not 'as of' anything — they must
    never match (the naive nulls-first sort would carry them everywhere)."""
    left = spark.createDataFrame([(1, 100, "x")], "k bigint, ts bigint, tag string")
    right = spark.createDataFrame(
        [(1, None, 9, "phantom")], "k bigint, rts bigint, a int, b string"
    )
    (row,) = asof_join(left, right, "k", "ts", "rts", ["a", "b"]).collect()
    assert (row["a"], row["b"]) == (None, None)


def test_asof_inner_drops_unmatched(spark):
    got = asof_join(
        _left(spark), _right(spark), "k", "ts", "rts", ["rid"],
        tiebreak=["rid"], how="inner",
    )
    assert {r["tag"] for r in got.collect()} == {"a", "b"}


def test_asof_plan_has_no_join_node(spark):
    plan = (
        asof_join(_left(spark), _right(spark), "k", "ts", "rts", ["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan, bad


def test_interval_banded_containment(spark):
    band = 100
    intervals = spark.createDataFrame(
        [(1, 50, 250), (2, 300, 310), (3, 400, 400)],
        "iid bigint, s bigint, e bigint",
    )
    points = spark.createDataFrame(
        [(10, 49), (11, 50), (12, 150), (13, 250), (14, 251), (15, 305), (16, 400)],
        "pid bigint, p bigint",
    )
    got = sorted(
        (r["iid"], r["pid"])
        for r in interval_join_banded(
            points, intervals, "p", "s", "e", band_us=band
        ).collect()
    )
    # inclusive bounds; interval 1 spans three bands but each pair once
    assert got == [(1, 11), (1, 12), (1, 13), (2, 15), (3, 16)]


def test_interval_banded_plan_no_cartesian(spark):
    intervals = spark.range(5).select(
        F.col("id").alias("iid"), (F.col("id") * 100).alias("s"),
        (F.col("id") * 100 + 50).alias("e"),
    )
    points = spark.range(50).select(
        F.col("id").alias("pid"), (F.col("id") * 7).alias("p")
    )
    plan = (
        interval_join_banded(points, intervals, "p", "s", "e", band_us=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Temporal KG: succession-based validity intervals + time-sliced in-force
# ---------------------------------------------------------------------------

def _h60_ts(doc_id: str) -> int:
    """Pure-Python replay of doc_event_seconds (md5-based H60 twin)."""
    import hashlib

    from openie_spark.operators.temporal import DOC_TS_BASE_S, DOC_TS_WINDOW_S

    h = int(hashlib.md5(doc_id.encode()).hexdigest()[:15], 16)
    return DOC_TS_BASE_S + h % DOC_TS_WINDOW_S


def _toy_triples(spark):
    # key (s1, likes): three docs = three instants; dA asserts TWO args at
    # the same instant (simultaneous — must coexist, not zero-truncate).
    # key (s2, runs): single assertion → open end.  SV + empty-arg rows
    # must be excluded.  Duplicate row in dA must collapse (DISTINCT).
    rows = [
        ("dA", "s1", "likes", "x", "SVO"),
        ("dA", "s1", "likes", "x", "SVO"),  # exact duplicate
        ("dA", "s1", "likes", "y", "SVO"),  # simultaneous sibling
        ("dB", "s1", "likes", "z", "SVO"),
        ("dC", "s1", "likes", "w", "SVO"),
        ("dA", "s2", "runs", "m", "SVA"),
        ("dA", "s3", "sleeps", "", "SV"),  # SV: excluded
        ("dB", "s3", "sleeps", "", "SVO"),  # empty arg: excluded
    ]
    return spark.createDataFrame(
        rows, "doc_id string, subj_norm string, rel string, arg_norm string, clause_type string"
    )


def test_triple_validity_intervals_succession(spark):
    from openie_spark.operators.temporal import (
        OPEN_END_S,
        triple_validity_intervals,
    )

    out = {
        (r.subj_norm, r.rel, r.arg_norm, r.doc_id): (r.valid_from_s, r.valid_to_s)
        for r in triple_validity_intervals(_toy_triples(spark)).collect()
    }
    tA, tB, tC = _h60_ts("dA"), _h60_ts("dB"), _h60_ts("dC")
    # expected succession for key (s1, likes): order instants, each
    # assertion valid until the next STRICTLY later instant
    inst = sorted([tA, tB, tC])
    nxt = {t: (inst[i + 1] if i + 1 < len(inst) else OPEN_END_S)
           for i, t in enumerate(inst)}
    assert len(out) == 5  # 4 argful s1 assertions (dup collapsed) + 1 s2
    assert out[("s1", "likes", "x", "dA")] == (tA, nxt[tA])
    assert out[("s1", "likes", "y", "dA")] == (tA, nxt[tA])  # coexists with x
    assert out[("s1", "likes", "z", "dB")] == (tB, nxt[tB])
    assert out[("s1", "likes", "w", "dC")] == (tC, nxt[tC])
    assert out[("s2", "runs", "m", "dA")] == (tA, OPEN_END_S)


def test_facts_in_force_counts(spark):
    from openie_spark.operators.temporal import facts_in_force

    iv = spark.createDataFrame(
        [
            ("s1", "likes", "x", "d1", 100, 200),
            ("s1", "likes", "y", "d2", 200, 300),
            ("s2", "runs", "m", "d3", 100, 300),
        ],
        "subj_norm string, rel string, arg_norm string, doc_id string, "
        "valid_from_s bigint, valid_to_s bigint",
    )
    rows = {r.probe_ts_s: r for r in facts_in_force(iv, (50, 100, 200, 299)).collect()}
    assert 50 not in rows  # nothing in force → no row
    assert (rows[100].n_facts, rows[100].n_keys, rows[100].n_subjects) == (2, 2, 2)
    # at 200: x's interval is half-open [100, 200) → excluded; y starts
    assert (rows[200].n_facts, rows[200].n_keys, rows[200].n_subjects) == (2, 2, 2)
    assert rows[299].n_facts == 2


def test_temporal_kg_random_bruteforce(spark):
    """Randomized cross-check (fixed seed, 300 assertions over a small key
    space — dense enough to hit duplicate keys, simultaneous assertions,
    and singleton keys): intervals and in-force counts must equal a
    pure-Python replay of the declared succession semantics."""
    import random
    from collections import defaultdict

    from openie_spark.operators.temporal import (
        KG_PROBE_INSTANTS,
        OPEN_END_S,
        facts_in_force,
        triple_validity_intervals,
    )

    rnd = random.Random(42)
    docs = [f"d{i:03d}" for i in range(40)]
    rows = [
        (
            rnd.choice(docs),
            rnd.choice(["s1", "s2", "s3", "s4", "s5"]),
            rnd.choice(["r1", "r2", "r3"]),
            rnd.choice([f"a{i}" for i in range(7)]),
            "SVO",
        )
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, subj_norm string, rel string, arg_norm string, clause_type string",
    )

    ts = {d: _h60_ts(d) for d in docs}
    assertions = sorted({(s, r, a, d) for d, s, r, a, _ in rows})
    inst = defaultdict(set)
    for s, r, a, d in assertions:
        inst[(s, r)].add(ts[d])
    expected = {}
    for s, r, a, d in assertions:
        t0 = ts[d]
        later = sorted(t for t in inst[(s, r)] if t > t0)
        expected[(s, r, a, d)] = (t0, later[0] if later else OPEN_END_S)

    iv = triple_validity_intervals(df)
    got = {
        (x.subj_norm, x.rel, x.arg_norm, x.doc_id): (x.valid_from_s, x.valid_to_s)
        for x in iv.collect()
    }
    assert got == expected

    force = {
        x.probe_ts_s: (x.n_facts, x.n_keys, x.n_subjects)
        for x in facts_in_force(iv, KG_PROBE_INSTANTS).collect()
    }
    for t in KG_PROBE_INSTANTS:
        live = [k for k, (f, to) in expected.items() if f <= t < to]
        want = (
            len(live),
            len({(s, r) for s, r, _a, _d in live}),
            len({s for s, _r, _a, _d in live}),
        )
        assert force.get(t, (0, 0, 0)) == (want if live else (0, 0, 0))
