"""The two extraction surfaces — mapInArrow (hot path) and the scalar
pandas-UDF twin — must emit identical triple sets over the golden corpus
(extract.py documents this claim; this test makes it true)."""

from __future__ import annotations

from openie_spark.operators.extract import extract_stage, extract_stage_pandas
from openie_spark.sources.tables import load_docs


def test_pandas_twin_matches_arrow_path(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    a = sorted(map(tuple, extract_stage(docs).collect()))
    b = sorted(map(tuple, extract_stage_pandas(docs).collect()))
    assert len(a) > 0
    assert a == b
