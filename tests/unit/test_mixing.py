"""Token-budgeted training-mix selection (operators/mixing.py): exact
Hamilton quota-sum law, the boundary-document fill convention, prefix-of-
hash-order selection, and the grouped prefix sum vs the naive per-group
window."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openie_spark.functions.hashing import portable_hash60
from openie_spark.operators.mixing import (
    hamilton_fill_quotas,
    token_budget_fill,
    token_budget_mix_summary,
)
from openie_spark.operators.prefix_sum import bucketed_prefix_sum


def _docs(spark, n=120):
    """Deterministic corpus: 3 sources of very different mass."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("source"),
        F.concat_ws(
            " ",
            F.array_repeat(F.lit("tok"), (F.pmod(F.xxhash64("id"), F.lit(17)) + 1).cast("int")),
        ).alias("text"),
    )


def test_hamilton_quotas_sum_exactly(spark):
    docs = _docs(spark)
    toks = docs.select(
        "source",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tokens"),
    )
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    quotas = {r["source"]: r["quota_tokens"] for r in hamilton_fill_quotas(toks).collect()}
    assert sum(quotas.values()) == total // 3
    assert all(q >= 0 for q in quotas.values())


def test_fill_boundary_convention(spark):
    """Every selected doc starts strictly below its quota; each filled
    source meets-or-overshoots the quota by < its last doc (fill_gap in
    [0, max_doc_tokens))."""
    docs = _docs(spark)
    sel = token_budget_fill(docs).collect()
    assert all(r["cum"] - r["n_tokens"] < r["quota_tokens"] for r in sel)
    summary = {r["source"]: r for r in token_budget_mix_summary(docs).collect()}
    for src, r in summary.items():
        max_doc = max(s["n_tokens"] for s in sel if s["source"] == src)
        assert 0 <= r["fill_gap"] < max_doc, (src, r)


def test_selection_is_prefix_of_hash_order(spark):
    """The selected set per source is exactly the first n_docs_selected
    documents in (portable_hash60(doc_id), doc_id) order — no gaps."""
    docs = _docs(spark)
    sel = token_budget_fill(docs)
    got = {
        (r["source"], r["doc_id"]) for r in sel.collect()
    }
    counts = {r["source"]: r["n_docs_selected"] for r in token_budget_mix_summary(docs).collect()}
    w = Window.partitionBy("source").orderBy(portable_hash60("doc_id"), "doc_id")
    ranked = docs.withColumn("_rk", F.row_number().over(w)).collect()
    want = {
        (r["source"], r["doc_id"])
        for r in ranked
        if r["_rk"] <= counts[r["source"]]
    }
    assert got == want


def test_grouped_prefix_sum_matches_naive_per_group(spark):
    rows = [
        ("a", 3, 10), ("a", 1, 5), ("a", 7, 2), ("b", 2, 100),
        ("b", 9, 1), ("c", 4, 7), ("a", 1, 3), ("b", 2, 4),
    ]
    df = spark.createDataFrame(rows, "g string, k bigint, w bigint").withColumn(
        "tie", F.monotonically_increasing_id()
    )
    got = {
        (r["g"], r["k"], r["w"]): r["cum"]
        for r in bucketed_prefix_sum(
            df, "k", "w", 2, tiebreak_cols=["tie"], group_cols=["g"]
        ).collect()
    }
    win = Window.partitionBy("g").orderBy("k", "tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["g"], r["k"], r["w"]): r["cum"]
        for r in df.withColumn("cum", F.sum("w").over(win).cast("long")).collect()
    }
    assert got == want


def test_grouped_default_off_is_global(spark):
    """group_cols=None keeps the original single-scan semantics."""
    rows = [(1, 2), (5, 3), (3, 1)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = {r["k"]: r["cum"] for r in bucketed_prefix_sum(df, "k", "w", 2).collect()}
    assert got == {1: 2, 3: 3, 5: 6}
