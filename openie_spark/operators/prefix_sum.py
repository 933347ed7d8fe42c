"""Distributed prefix sums + weighted systematic (PPS) sampling.

A running total over a GLOBAL order is the textbook single-partition trap:
`Window.orderBy(...)` with no partition key makes Spark funnel the whole
table through ONE task — fine at sf0.01, dead at 100 TB.  The scalable
formulation is the classic two-phase scan (Blelloch 1990 — public
knowledge): local prefix sums within ordered blocks, then block totals
prefix-summed and added back as offsets.

Block key choice matters for the PLAN.  `spark_partition_id()` after a
`repartitionByRange` works but costs a SECOND full shuffle (the window's
hash exchange on the pid).  Instead we derive the block from the order
key itself — `bucket = key div bucket_width` — which is monotonic in the
key (for non-negative keys), so:

  * the window hash-shuffles on `_bkt` — the ONLY full-data exchange;
  * the block-totals groupBy runs on the SAME partitioning (no exchange,
    Catalyst reuses it);
  * the offsets table (#buckets rows) takes a tiny single-partition
    window and broadcasts back — no exchange on the big side.

Total: one shuffle, all JVM, bit-identical to the naive global window.
Caller picks `bucket_width` so #buckets is ~10^3..10^6 at the target
scale (offsets stay broadcastable); heavily-skewed keys should pre-map to
a dense rank first (the range-partitioner variant costs one more shuffle
and handles any distribution — deliberately not the default).

On top of it: weighted systematic sampling (probability proportional to
size, Madow 1949) — select every row whose cumulative-weight interval
contains a multiple of stride = total div n.  Deterministic,
engine-portable pure-integer arithmetic, ONE pass — the standard way to
draw a fixed-budget training mix weighted by token count without a
per-doc RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_prefix_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bucket_width: int,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "cum",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Inclusive prefix sum of `value_col` over the total order
    (key_col, *tiebreak_cols).  Caller contract: `key_col` is numeric
    and non-negative — integral `div` truncates toward zero, so the
    bucket map is only order-preserving for keys >= 0.  Adds `out_col`,
    preserves input columns.

    With ``group_cols`` the scan restarts per group (the cumulative sum
    is independent within each group, same total order inside).  The
    offsets table grows to #groups × #buckets rows and its window
    partitions by group, so it stays broadcastable as long as that
    product is bounded (callers with huge group vocabularies should
    widen ``bucket_width``)."""
    reserved = {"_bkt", "_local_cum", "_btotal", "_offset"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"bucketed_prefix_sum: reserved internal columns in input: {sorted(reserved)}"
        )
    ties = tiebreak_cols or []
    groups = group_cols or []
    order = [F.col(key_col).asc()] + [F.col(c).asc() for c in ties]

    b = df.withColumn("_bkt", F.expr(f"CAST({key_col} AS BIGINT) div {bucket_width}"))
    local_w = Window.partitionBy(*groups, "_bkt").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = b.withColumn("_local_cum", F.sum(value_col).over(local_w))

    totals = local.groupBy(*groups, "_bkt").agg(F.sum(value_col).alias("_btotal"))
    off_w = Window.partitionBy(*groups).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    # #groups × #buckets rows — the windowed side here is the tiny side
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_btotal").over(off_w), F.lit(0))
    ).select(*groups, "_bkt", "_offset")

    return (
        local.join(F.broadcast(offsets), [*groups, "_bkt"])
        .withColumn(out_col, (F.col("_local_cum") + F.col("_offset")).cast("long"))
        .drop("_bkt", "_local_cum", "_offset")
    )


def pps_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n_samples: int,
    bucket_width: int = 65536,
    cum_col: str = "cum",
) -> DataFrame:
    """Weighted systematic sample: stride = max(1, total div n_samples);
    a row is selected iff its cumulative-weight interval (cum - w, cum]
    contains a stride multiple.  The count of multiples in a half-open
    integer interval is `cum div stride - (cum - w) div stride` — exact
    integer form (DuckDB `//` agrees for non-negative operands).  Rows
    with weight >= stride are selected with multiplicity; `n_hits`
    reports it (large docs count more than once in the drawn mix — the
    PPS semantics).  Requires positive integer weights; yields
    ~n_samples rows (± rounding of the last stride).

    Caller contract (mirrors bucketed_prefix_sum's non-negative-key
    rule): ``key_col`` values must be UNIQUE.  The cumulative order among
    equal keys is engine-dependent, so with duplicate keys WHICH
    duplicate receives a stride hit varies run to run (total n_hits
    stays exact).  Pass a unique id, or pre-combine duplicates."""
    reserved = {"stride", "n_hits", cum_col} & set(df.columns)
    if reserved:
        raise ValueError(
            f"pps_systematic_sample: reserved column names in input: {sorted(reserved)}"
        )
    with_cum = bucketed_prefix_sum(
        df, key_col, weight_col, bucket_width, out_col=cum_col
    )
    # total weight == max(cum), but summing the RAW weights avoids
    # executing the whole prefix-sum subtree a second time for one scalar
    total = df.agg(F.sum(weight_col).cast("long").alias("t"))
    stride = F.greatest(F.lit(1).cast("long"), F.expr(f"t div {n_samples}")).alias(
        "stride"
    )
    strided = with_cum.crossJoin(F.broadcast(total.select(stride)))
    hits = F.expr(f"({cum_col} div stride) - (({cum_col} - {weight_col}) div stride)")
    return (
        strided.withColumn("n_hits", hits.cast("long"))
        .where(F.col("n_hits") > 0)
        .drop("stride")
    )
