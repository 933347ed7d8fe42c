"""Token-budgeted training-mix selection — the sampling step that turns
per-domain mixing weights into an actual document manifest.

`domain_mix` (registry) computes Hamilton per-mille WEIGHTS; this module
executes a mix: apportion a global token budget across sources by the
same largest-remainder method (Hamilton 1792 — exact, integral, the
quotas sum to the budget by construction), then FILL each source's quota
greedily over a deterministic document order (portable 60-bit hash of
the doc id, doc id tiebreak — reproducible across engines, retries and
cluster sizes; equivalent to a uniform random epoch shuffle with common
random numbers).  A document is selected iff the cumulative token count
of the documents ordered before it is still below the quota — so the
boundary document that crosses the quota IS included (the standard
budget-fill convention: the quota is a lower bound on selected tokens,
overshooting by at most one document).

Scale shape:
- per-source token masses: ONE groupBy(source) with map-side combine;
  the apportionment then runs on the source-vocabulary-bounded frame
  (unpartitioned windows over #sources rows, never corpus rows).
- the per-source cumulative order uses the grouped
  :func:`~openie_spark.operators.prefix_sum.bucketed_prefix_sum` — the
  two-phase scan, ONE corpus shuffle on (source, hash-bucket), never a
  single-partition global window (a hot source spreads over
  2^60/BUCKET_WIDTH buckets).
- quotas broadcast back onto the corpus for the selection filter.

Integer-overflow contract: the Hamilton numerator is budget × source
tokens, which must fit int64 — fine up to ~10^9-token sources against
~10^9-token budgets; at the 10^12-token scale pre-divide token masses
by a common factor (kilo-tokens) before apportioning, which changes the
quotas by < 1 document.

One-home rule (CLAUDE.md): the constants, the Spark builder AND the
DuckDB twin SQL live here; the registry interpolates — they cannot fork.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60, portable_hash60_sql
from openie_spark.operators.prefix_sum import bucketed_prefix_sum

# Epoch budget = total corpus tokens div TOKEN_BUDGET_DIV (a fixed
# fraction, so the query is meaningful at every scale factor).
TOKEN_BUDGET_DIV = 3
# 60-bit hash keys div 2^50 → 1024 buckets for the grouped prefix sum.
FILL_BUCKET_WIDTH = 1 << 50

# Whitespace token count — same spelling as domain_mix / term_retrieval
# (JVM twin of DuckDB's len(list_filter(string_split_regex(...)))).
# Built lazily: a module-level Column needs an active SparkContext and
# would crash zipimport under --py-files (tests/unit/test_dist.py).
def _toks():
    return F.size(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    ).cast("bigint")

_TOKS_SQL = (
    r"CAST(len(list_filter(string_split_regex(lower(text), '\s+'),"
    r" x -> x <> '')) AS BIGINT)"
)


def hamilton_fill_quotas(
    toks: DataFrame, budget_div: int = TOKEN_BUDGET_DIV
) -> DataFrame:
    """(source, quota_tokens) with Σ quota_tokens == total div budget_div
    exactly: floor quotas by `div`, then the leftover seats go to the
    largest remainders (ties on source asc)."""
    per = toks.groupBy("source").agg(F.sum("n_tokens").alias("m"))
    everything = Window.partitionBy()
    per = (
        per.withColumn("_total", F.sum("m").over(everything))
        .withColumn("_b", F.expr(f"_total div {budget_div}"))
        .select(
            "source",
            F.expr("m * _b div _total").alias("_quota"),
            F.expr("(m * _b) % _total").alias("_rem"),
            "_b",
        )
    )
    per = per.withColumn(
        "_r", F.col("_b") - F.sum("_quota").over(everything)
    ).withColumn(
        "_rk",
        F.row_number().over(Window.orderBy(F.desc("_rem"), F.asc("source"))),
    )
    return per.select(
        "source",
        (F.col("_quota") + (F.col("_rk") <= F.col("_r")).cast("bigint")).alias(
            "quota_tokens"
        ),
    )


def token_budget_fill(
    docs: DataFrame,
    budget_div: int = TOKEN_BUDGET_DIV,
    bucket_width: int = FILL_BUCKET_WIDTH,
) -> DataFrame:
    """Per-document selection manifest: (source, doc_id, n_tokens, cum,
    quota_tokens) — one row per SELECTED document (cum − n_tokens <
    quota_tokens over the hash order)."""
    toks = docs.select("source", "doc_id", _toks().alias("n_tokens"))
    quotas = hamilton_fill_quotas(toks, budget_div)
    cum = bucketed_prefix_sum(
        toks.withColumn("h", portable_hash60("doc_id")),
        "h",
        "n_tokens",
        bucket_width,
        tiebreak_cols=["doc_id"],
        group_cols=["source"],
    )
    return (
        cum.join(F.broadcast(quotas), "source")
        .where(F.col("cum") - F.col("n_tokens") < F.col("quota_tokens"))
        .select("source", "doc_id", "n_tokens", "cum", "quota_tokens")
    )


def token_budget_mix_summary(
    docs: DataFrame, budget_div: int = TOKEN_BUDGET_DIV
) -> DataFrame:
    """Per-source manifest summary: quota, docs/tokens selected, and the
    signed fill gap (tokens_selected − quota: ≥ 0 when the source filled
    its quota — the boundary-document overshoot — negative only when the
    source ran out of documents)."""
    sel = token_budget_fill(docs, budget_div)
    return (
        sel.groupBy("source")
        .agg(
            F.max("quota_tokens").alias("quota_tokens"),
            F.count("*").cast("long").alias("n_docs_selected"),
            F.sum("n_tokens").cast("long").alias("tokens_selected"),
        )
        .withColumn(
            "fill_gap", F.col("tokens_selected") - F.col("quota_tokens")
        )
    )


def token_budget_mix_sql(
    docs_sql: str = "SELECT source, doc_id, text FROM documents",
    budget_div: int = TOKEN_BUDGET_DIV,
) -> str:
    """DuckDB twin of :func:`token_budget_mix_summary` over any
    (source, doc_id, text) relation.  MUST stay in lockstep — one
    constant set drives both (the registry interpolates the module
    defaults)."""
    # Spark's concat_ws stringifies the bigint implicitly; DuckDB's md5
    # needs the explicit cast (same decimal rendering both sides).
    h60 = portable_hash60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH docs AS ({docs_sql}),
toks AS (
  SELECT source, doc_id, {_TOKS_SQL} AS n_tokens FROM docs
),
per AS (SELECT source, SUM(n_tokens) AS m FROM toks GROUP BY 1),
q AS (
  SELECT source, m,
         SUM(m) OVER () AS total,
         SUM(m) OVER () // {budget_div} AS b
  FROM per
),
q2 AS (
  SELECT source, m * b // total AS quota, (m * b) % total AS rem, b
  FROM q
),
r AS (
  SELECT *, b - SUM(quota) OVER () AS leftover,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
  FROM q2
),
quotas AS (
  SELECT source,
         CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS quota_tokens
  FROM r
),
cum AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY {h60} ASC, doc_id ASC
         ) AS cum
  FROM toks
),
sel AS (
  SELECT c.source, c.n_tokens, q.quota_tokens
  FROM cum c JOIN quotas q USING (source)
  WHERE c.cum - c.n_tokens < q.quota_tokens
)
SELECT source,
       MAX(quota_tokens) AS quota_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs_selected,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
       CAST(SUM(n_tokens) - MAX(quota_tokens) AS BIGINT) AS fill_gap
FROM sel
GROUP BY source
ORDER BY source
"""
