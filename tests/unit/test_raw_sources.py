"""L1 tests for raw-file ingestion (sources/raw.py): JSONL and
one-file-per-document layouts land in DOC_SCHEMA and extract correctly."""

from __future__ import annotations

import json
from pathlib import Path

from openie_spark.operators.extract import extract_stage
from openie_spark.schemas import DOC_SCHEMA
from openie_spark.sources.raw import ingest_jsonl, ingest_text_dir


def test_ingest_jsonl_flat_and_spans(spark, tmp_path):
    lines = [
        {"doc_id": "a", "text": "acme corp hired an engineer."},
        {
            "doc_id": "b",
            "spans": [
                {"kind": "text", "text": "delta works owns a factory.",
                 "media_ref": None, "offset": 0},
                {"kind": "image", "text": None,
                 "media_ref": "media://b/0", "offset": 27},
            ],
        },
    ]
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in lines))
    df = ingest_jsonl(spark, str(p))
    assert df.schema.simpleString() == DOC_SCHEMA.simpleString()
    rows = {r["doc_id"]: r["spans"] for r in df.collect()}
    assert rows["a"][0]["kind"] == "text" and rows["a"][0]["offset"] == 0
    assert rows["b"][1]["kind"] == "image"
    assert extract_stage(df).count() > 0


def test_ingest_text_dir(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "doc1.txt").write_text("acme corp hired an engineer.")
    (d / "doc2.txt").write_text("vertex group owns a factory. it ships parts.")
    df = ingest_text_dir(spark, str(d))
    assert df.schema.simpleString() == DOC_SCHEMA.simpleString()
    rows = {r["doc_id"]: r["spans"] for r in df.collect()}
    assert set(rows) == {"doc1", "doc2"}
    # whole file = one span, text preserved byte-for-byte
    assert rows["doc2"][0]["text"] == "vertex group owns a factory. it ships parts."
    triples = extract_stage(df)
    assert triples.where("doc_id = 'doc1'").count() == 1
