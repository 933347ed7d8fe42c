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


def test_ingest_text_dir_subdirs_do_not_collide(spark, tmp_path):
    """Equal base names in different subdirectories must yield distinct
    doc_ids (DOC_SCHEMA's doc_id-unique contract)."""
    d = tmp_path / "corpus2"
    (d / "sub1").mkdir(parents=True)
    (d / "sub2").mkdir()
    (d / "sub1" / "doc.txt").write_text("first text.")
    (d / "sub2" / "doc.txt").write_text("second text.")
    df = ingest_text_dir(spark, str(d), glob="*/*.txt")
    ids = {r["doc_id"] for r in df.collect()}
    assert ids == {"sub1/doc", "sub2/doc"}


def test_ingest_text_dir_root_with_space(spark, tmp_path):
    """input_file_name() percent-encodes the URI; the root prefix must be
    matched in its encoded form or the whole URI leaks into doc_id."""
    d = tmp_path / "my docs"
    d.mkdir()
    (d / "doc1.txt").write_text("hello world.")
    df = ingest_text_dir(spark, str(d))
    assert [r["doc_id"] for r in df.collect()] == ["doc1"]


def test_ingest_text_dir_extensionless_keeps_name(spark, tmp_path):
    """Extension-less files must keep their full name, not collapse to an
    empty doc_id."""
    d = tmp_path / "corpus3"
    d.mkdir()
    (d / "README").write_text("plain file.")
    df = ingest_text_dir(spark, str(d), glob="*")
    assert [r["doc_id"] for r in df.collect()] == ["README"]


def test_csv_ingestion_quoted_multiline(spark, tmp_path):
    """ingest_csv: declared schema, RFC-4180 quoting — embedded commas,
    quotes, and newlines inside a document survive; null text becomes an
    empty single span."""
    from openie_spark.sources.raw import ingest_csv

    p = tmp_path / "docs.csv"
    p.write_text(
        'doc_id,text\n'
        'd1,"hello, world"\n'
        'd2,"line one\nline two"\n'
        'd3,"she said ""hi"""\n'
        'd4,\n'
    )
    rows = {
        r["doc_id"]: r["spans"]
        for r in ingest_csv(spark, str(p)).collect()
    }
    assert set(rows) == {"d1", "d2", "d3", "d4"}
    texts = {k: v[0]["text"] for k, v in rows.items()}
    assert texts == {
        "d1": "hello, world",
        "d2": "line one\nline two",
        "d3": 'she said "hi"',
        "d4": "",
    }
    for v in rows.values():
        assert len(v) == 1 and v[0]["kind"] == "text" and v[0]["offset"] == 0


def test_csv_ingestion_binds_by_header_name(spark, tmp_path):
    """Reordered/extended headers must bind by NAME (a positional bind
    would silently swap ids and texts) and a missing column must raise."""
    import pytest

    from openie_spark.sources.raw import ingest_csv

    p = tmp_path / "reordered.csv"
    p.write_text('extra,text,doc_id\nx,"some words",d9\n')
    rows = ingest_csv(spark, str(p)).collect()
    assert [(r["doc_id"], r["spans"][0]["text"]) for r in rows] == [
        ("d9", "some words")
    ]
    bad = tmp_path / "noheader.csv"
    bad.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="lacks column"):
        ingest_csv(spark, str(bad))
