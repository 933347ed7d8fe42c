"""OP-20..23 — the fused extraction operator.

One vectorized pandas UDF runs segmentation → tokenization → tagging →
triple extraction in a single Python pass per Arrow batch (SURVEY.md §4.2-B:
one UDF fence instead of four chained ones = 4x fewer Arrow round-trips;
rationale: CIDR 2022 "Accelerating Python UDFs in Vectorized Query
Execution").  The UDF READS `spans` and emits a new triples column; it never
rewrites `spans` (the per-row span-sequence invariant, BASELINE.json
input_hint).

The rule logic itself is imported from the frozen spec (spec/rules.py) so the
distributed pipeline and the single-process oracle are the same rule set by
construction — P/R vs the oracle measures only distributed-execution fidelity
(Arrow round-trips, partition order, dedup), which is exactly what the
BASELINE metric wants to gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from openie_spark.schemas import TRIPLE_STRUCT, TRIPLES_SCHEMA, assert_schema
from openie_spark.spec.rules import RULESET_VERSION, extract_document


@pandas_udf(ArrayType(TRIPLE_STRUCT))
def extract_triples_udf(spans: pd.Series) -> pd.Series:
    """spans: Series of list[dict] (Arrow-decoded array<struct>).
    Returns Series of list[dict] matching TRIPLE_STRUCT."""
    out = []
    for doc_spans in spans:
        if doc_spans is None:
            out.append([])
            continue
        out.append([t._asdict() for t in extract_document(list(doc_spans))])
    return pd.Series(out, dtype=object)


def extract_stage(docs: DataFrame) -> DataFrame:
    """documents[DOC_SCHEMA] → triples[TRIPLES_SCHEMA].

    Plan shape: scan → (optional salted repartition upstream) → one
    ArrowEvalPython node → generate/explode → project.  No shuffle is
    required by this stage itself; the explode is pipelined.
    """
    triples = (
        docs.select("doc_id", F.explode(extract_triples_udf("spans")).alias("t"))
        .select(
            "doc_id",
            F.col("t.sent_idx").alias("sent_idx"),
            F.col("t.subj").alias("subj"),
            F.col("t.rel").alias("rel"),
            F.col("t.arg").alias("arg"),
            F.col("t.subj_norm").alias("subj_norm"),
            F.col("t.arg_norm").alias("arg_norm"),
            F.col("t.conf").alias("conf"),
        )
        .withColumn("ruleset", F.lit(RULESET_VERSION))
    )
    assert_schema(triples, TRIPLES_SCHEMA, "extract_stage")
    return triples


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """triples → mentions (exploded subj/arg roles) for linking (OP-24 output
    is already carried as subj_norm/arg_norm — pure built-ins downstream)."""
    subj = triples.select(
        F.col("subj_norm").alias("mention_norm"),
        "doc_id",
        "sent_idx",
        F.lit("subj").alias("role"),
        F.col("subj").alias("surface"),
    )
    arg = triples.select(
        F.col("arg_norm").alias("mention_norm"),
        "doc_id",
        "sent_idx",
        F.lit("arg").alias("role"),
        F.col("arg").alias("surface"),
    )
    return subj.unionByName(arg)
