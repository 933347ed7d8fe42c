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
    (ts, side, tiebreak), carry each right value forward with
    ``last(ignorenulls)`` over an unbounded-preceding frame, keep left
    rows.  One hash shuffle on ``key``; no inequality join anywhere.
    ``how='inner'`` drops left rows with no prior right row."""
    tiebreak = tiebreak or []
    l_payload = [c for c in left.columns if c != key]
    overlap = set(l_payload) & set(right_vals + tiebreak)
    if overlap:
        raise ValueError(
            f"asof_join: rename right-side columns colliding with left: {sorted(overlap)}"
        )
    l = left.withColumn("_t", F.col(left_ts).cast("long")).withColumn(
        "_s", F.lit(1)
    )
    for c in right_vals:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    for c in tiebreak:
        if c not in right_vals:
            l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key),
        F.col(right_ts).cast("long").alias("_t"),
        *dict.fromkeys(right_vals + tiebreak),
    ).withColumn("_s", F.lit(0))
    for c in l_payload:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "_t", "_s"] + l_payload + list(dict.fromkeys(right_vals + tiebreak))
    u = l.select(*cols).unionByName(r.select(*cols))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_s").asc(), *[F.col(c).asc() for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_vals:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.where(F.col("_s") == 1).drop("_t", "_s", *[c for c in tiebreak if c not in right_vals])
    if how == "inner":
        out = out.where(F.col(right_vals[0]).isNotNull())
    return out.select(key, *l_payload, *right_vals)


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
