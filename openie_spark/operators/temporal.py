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
