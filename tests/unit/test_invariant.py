"""OP-25 checker semantics: mutations, drops, duplications, and reorders
must all be detected; identical inputs pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.invariant import arrow_roundtrip, check_span_invariant
from openie_spark.schemas import DOC_SCHEMA
from openie_spark.sources.tables import load_docs


def test_identical_ok(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    res = check_span_invariant(docs, docs.select("doc_id", "spans"))
    assert res == {"missing": 0, "extra": 0, "ok": True}


def test_detects_text_mutation(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    mutated = docs.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "g00000",
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    F.concat(F.coalesce(s["text"], F.lit("")), F.lit("x")).alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.col("spans")),
    )
    res = check_span_invariant(docs, mutated)
    assert res["missing"] == 1 and res["extra"] == 1 and not res["ok"]


def test_detects_dropped_and_duplicated_docs(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    dropped = docs.where(F.col("doc_id") != "g00001")
    res = check_span_invariant(docs, dropped)
    assert res["missing"] == 1 and res["extra"] == 0

    dup = docs.unionByName(docs.where(F.col("doc_id") == "g00002"))
    res = check_span_invariant(docs, dup)
    assert res["missing"] == 0 and res["extra"] == 1


def test_arrow_roundtrip_lineage_is_byte_equal(spark, golden_docs_path):
    """The in-run gate's output side (identity mapInArrow + shuffle
    repartition) must preserve the span sequence byte-equal — including
    the null-vs-empty / unicode hazard rows."""
    docs = load_docs(spark, golden_docs_path)
    assert check_span_invariant(docs, arrow_roundtrip(docs))["ok"]

    hazard = spark.createDataFrame(
        [
            ("h0", [("text", "", None, 0), ("text", None, None, 1)]),
            ("h1", [("text", "中文 naïve ' quote", None, 0)]),
            ("h2", [("image", None, "media://h2/0", 0), ("text", "x.", None, 7)]),
        ],
        DOC_SCHEMA,
    )
    assert check_span_invariant(hazard, arrow_roundtrip(hazard))["ok"]


def test_arrow_roundtrip_gate_catches_corruption(spark, golden_docs_path):
    """A lineage that DOES rewrite spans (null → empty string — the classic
    Arrow round-trip regression) must fail the same gate."""
    docs = load_docs(spark, golden_docs_path)
    corrupted = arrow_roundtrip(docs).withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.coalesce(s["text"], F.lit("")).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    res = check_span_invariant(docs, corrupted)
    assert not res["ok"] and res["missing"] > 0


def test_detects_span_reorder(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    reordered = docs.withColumn(
        "spans", F.when(F.size("spans") > 1, F.reverse("spans")).otherwise(F.col("spans"))
    )
    res = check_span_invariant(docs, reordered)
    assert not res["ok"] and res["missing"] > 0
