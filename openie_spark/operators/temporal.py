"""Temporal joins (OP-55 family — as-of and interval/range joins).

SURVEY.md §2.6 marked these N/A for the KG pipeline proper; they are
implemented here as first-class general operators because every
training-data/event pipeline at 100 TB eventually needs them, and the
naive formulations are exactly the plans that do NOT survive scale:

  - a naive as-of join is an inequality theta-join → BroadcastNestedLoop
    (quadratic);  ``asof_join`` instead unions both sides and carries the
    right-side values forward with a window — ONE shuffle on the key,
    linear, whole-stage-codegen friendly.
  - a naive interval-containment join with no equi key is a cartesian
    product;  ``interval_join_banded`` buckets time into coarse bands,
    explodes each interval to the bands it covers (bounded fan-out =
    len/band + 1), equi-joins on the band, then applies the exact
    containment filter — the banded-join pattern shared with the LSH
    paths.

Both are deterministic: as-of ties resolve through an explicit total
order, and the banded join maps each point to exactly one band so no
pair is ever produced twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """For every left row, attach the latest right row of the same ``key``
    with ``right_ts <= left_ts`` (ties on right_ts: greatest ``tiebreak``
    wins — pass a unique column for full determinism).

    Plan shape: tag-and-union both sides, sort within the key partition by
    (ts, side, tiebreak), carry the matched right row forward as ONE
    struct with ``last(ignorenulls)`` over an unbounded-preceding frame,
    keep left rows.  The struct carry is load-bearing for correctness:
    carrying the right columns individually would mix values from
    DIFFERENT right rows whenever a right value is NULL (last(ignorenulls)
    would skip back further for that column only).  Right rows with NULL
    ``right_ts`` are excluded — "as of" is undefined for them, matching
    the ``right_ts <= left_ts`` predicate of the SQL formulation.  One
    hash shuffle on ``key``; no inequality join anywhere.  ``how='inner'``
    drops left rows with no prior right row."""
    from pyspark.sql.types import StructField, StructType

    tiebreak = tiebreak or []
    l_payload = [c for c in left.columns if c != key]
    rv_all = list(dict.fromkeys(right_vals + tiebreak))
    overlap = set(l_payload) & set(rv_all)
    if overlap:
        raise ValueError(
            f"asof_join: rename right-side columns colliding with left: {sorted(overlap)}"
        )
    reserved = {"_t", "_s", "_rv"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            "asof_join: internal column names are reserved, rename inputs: "
            f"{sorted(reserved)}"
        )
    rv_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in rv_all]
    )
    l = (
        left.withColumn("_t", F.col(left_ts).cast("long"))
        .withColumn("_s", F.lit(1))
        .withColumn("_rv", F.lit(None).cast(rv_type))
    )
    r = (
        right.where(F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).cast("long").alias("_t"),
            F.struct(*[F.col(c) for c in rv_all]).alias("_rv"),
        )
        .withColumn("_s", F.lit(0))
    )
    for c in l_payload:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "_t", "_s", "_rv"] + l_payload
    u = l.select(*cols).unionByName(r.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_t").asc(),
            F.col("_s").asc(),
            *[F.col("_rv").getField(c).asc() for c in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rv", F.last("_rv", ignorenulls=True).over(w))
    out = u.where(F.col("_s") == 1)
    if how == "inner":
        out = out.where(F.col("_rv").isNotNull())
    return out.select(
        key,
        *l_payload,
        *[F.col("_rv").getField(c).alias(c) for c in right_vals],
    )


SESSION_GAP_US = 30 * 60 * 1_000_000


def with_session_seq(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    order_cols: tuple = (),
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Lag-window session splitting — THE single definition of the
    session-gap rule, shared by the batch queries (registry ``sessionize``
    / ``session_concurrency``), the batch twin of the streaming operator
    (streaming/stateful.py), and — via ``SESSION_GAP_US`` — the stateful
    stream itself.  Adds a ``session_seq`` column (1-based per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    new_sess = (gap.isNull() | (gap > gap_us)).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_seq", F.sum(new_sess).over(run))


# ---------------------------------------------------------------------------
# Temporal KG edges (SURVEY §7 candidate, landed r4): validity intervals on
# triples by FACT SUCCESSION — the standard temporal-KG construction when
# facts carry assertion times but no explicit end times: an assertion of
# fact-key (subj, rel) is valid from its assertion instant until the next
# strictly-later assertion of the same key (any argument); the last
# assertion stays open.  The corpus carries no real timestamps, so each
# doc's assertion instant derives deterministically from the
# engine-portable 60-bit hash (functions/hashing.py — same scheme on both
# engines).  This module is the ONE home for the constants, the Spark
# builders, and the DuckDB twin of the time derivation; the registry
# queries and their oracles interpolate from here (the session-gap /
# rule-mining lockstep pattern).
# ---------------------------------------------------------------------------

DOC_TS_BASE_S = 1_700_000_000  # 2023-11-14T22:13:20Z
DOC_TS_WINDOW_S = 30 * 86_400  # assertion instants spread over 30 days
OPEN_END_S = 253_402_300_800  # 10000-01-01T00:00:00Z: "still valid" sentinel
# probe instants for time-sliced queries: 8 evenly spaced, ending at the
# window edge (the last probe sees only still-open facts)
KG_PROBE_INSTANTS = tuple(
    DOC_TS_BASE_S + (i * DOC_TS_WINDOW_S) // 8 for i in range(1, 9)
)


def doc_event_seconds(doc_col: str = "doc_id"):
    """Deterministic per-doc assertion instant as bigint epoch-seconds:
    BASE + H60(doc_id) % WINDOW.  H60 is non-negative, so Spark ``pmod``
    and DuckDB ``%`` agree bit-for-bit (twin: ``doc_event_seconds_sql``)."""
    from openie_spark.functions.hashing import portable_hash60

    return (
        F.lit(DOC_TS_BASE_S)
        + F.pmod(portable_hash60(doc_col), F.lit(DOC_TS_WINDOW_S))
    ).cast("long")


def doc_event_seconds_sql(expr: str = "doc_id") -> str:
    """DuckDB twin of ``doc_event_seconds`` — interpolate into oracle SQL."""
    from openie_spark.functions.hashing import portable_hash60_sql

    return f"({DOC_TS_BASE_S} + {portable_hash60_sql(expr)} % {DOC_TS_WINDOW_S})"


def triple_validity_intervals(triples: DataFrame) -> DataFrame:
    """Succession-based validity intervals over argful triples.

    Declared semantics (the SQL oracle in plans/registry.py mirrors them
    clause-for-clause):

      * an ASSERTION is a DISTINCT (subj_norm, rel, arg_norm, doc_id) with
        clause_type != 'SV' and a non-empty argument, timestamped by
        ``doc_event_seconds(doc_id)``;
      * a FACT KEY is (subj_norm, rel); an assertion is valid from its
        instant until the next STRICTLY LATER assertion of the same key —
        simultaneous assertions (same doc, or hash-coincident docs) coexist
        rather than zero-length-truncating each other;
      * the last assertion of a key stays open: ``valid_to_s = OPEN_END_S``
        — a sentinel, never NULL, because NULL-in-int64 materializes as
        float64 in pandas on both engines and would poison the
        dtype-strict driver compare.

    Plan (audited): three narrow linear shuffles over the assertions frame
    — the assertion distinct, the per-key instant distinct, and the fact-
    key window — then the assertion→interval attach joins on (key,
    instant) (broadcast at small SF; SMJ on the same key at scale).  No
    inequality join anywhere.  Skew note: a pathologically hot (subj, rel)
    key makes one window partition large, but the window is a linear scan
    (lead), not a pairwise product — it degrades, never explodes."""
    a = (
        triples.where((F.col("clause_type") != "SV") & (F.col("arg_norm") != ""))
        .select("subj_norm", "rel", "arg_norm", "doc_id")
        .distinct()
        .withColumn("valid_from_s", doc_event_seconds("doc_id"))
    )
    d = (
        a.select("subj_norm", "rel", "valid_from_s")
        .distinct()
        .withColumn(
            "valid_to_s",
            F.coalesce(
                F.lead("valid_from_s").over(
                    Window.partitionBy("subj_norm", "rel").orderBy("valid_from_s")
                ),
                F.lit(OPEN_END_S),
            ),
        )
    )
    return a.join(d, ["subj_norm", "rel", "valid_from_s"]).select(
        "subj_norm", "rel", "arg_norm", "doc_id", "valid_from_s", "valid_to_s"
    )


def facts_in_force(
    intervals: DataFrame, instants: tuple[int, ...] = KG_PROBE_INSTANTS
) -> DataFrame:
    """Time-sliced KG: per probe instant t, the facts in force (intervals
    with ``valid_from_s <= t < valid_to_s``) — as-of semantics ("latest
    assertion at or before t, not yet superseded") realized through the
    intervals with ONE narrow explode instead of an as-of join per probe:
    each interval emits exactly the probes it contains via a literal-array
    filter (fan-out <= len(instants), no join, no BroadcastNestedLoop).
    Probes with zero facts in force yield no row — mirrored by the SQL
    oracle's inner containment join."""
    probes = F.array(*[F.lit(int(t)).cast("long") for t in instants])
    return (
        intervals.withColumn(
            "probe_ts_s",
            F.explode(
                F.filter(
                    probes,
                    lambda t: (t >= F.col("valid_from_s"))
                    & (t < F.col("valid_to_s")),
                )
            ),
        )
        .groupBy("probe_ts_s")
        .agg(
            F.count("*").alias("n_facts"),
            F.countDistinct(F.concat_ws("|", "subj_norm", "rel")).alias("n_keys"),
            F.countDistinct("subj_norm").alias("n_subjects"),
        )
        .orderBy("probe_ts_s")
    )


def interval_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    p_ts: str,
    i_start: str,
    i_end: str,
    band_us: int = 3_600_000_000,
) -> DataFrame:
    """Time-containment join (``i_start <= p_ts <= i_end``) with NO equi
    key, as a banded equi-join: each interval explodes to the coarse time
    bands it covers, each point maps to exactly one band, the join runs on
    the band, and the exact containment predicate filters within bands.
    Fan-out per interval = ceil(len/band)+1 — bounded; no cartesian, no
    BroadcastNestedLoop.  Each qualifying (interval, point) pair appears
    exactly once (a point has one band)."""
    b = F.lit(band_us)
    i = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(i_start) / b).cast("long"),
                F.floor(F.col(i_end) / b).cast("long"),
            )
        ),
    )
    p = points.withColumn("_band", F.floor(F.col(p_ts) / b).cast("long"))
    return (
        i.join(p, "_band")
        .where((F.col(p_ts) >= F.col(i_start)) & (F.col(p_ts) <= F.col(i_end)))
        .drop("_band")
    )
