"""Structured Streaming surface tests (streaming/ingest.py): incremental
file ingest equals batch output; rerun processes only new files; the
watermarked window agg equals its batch twin."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from openie_spark.operators.extract import extract_stage
from openie_spark.sources.tables import load_docs
from openie_spark.streaming.ingest import stream_event_counts, stream_extract, windowed_event_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt", "ev_ckpt")}
    Path(d["in"]).mkdir()
    return d


def _triples_key_set(df):
    return {
        (r["doc_id"], r["sent_idx"], r["subj"], r["rel"], r["arg"])
        for r in df.collect()
    }


def test_stream_extract_matches_batch_and_is_incremental(spark, golden_docs_path, dirs):
    docs = load_docs(spark, golden_docs_path)
    first = docs.where(F.col("doc_id") < "g00400")
    second = docs.where(F.col("doc_id") >= "g00400")

    # land the first batch of files, drain with AvailableNow
    first.coalesce(2).write.mode("overwrite").parquet(dirs["in"])
    q = stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    got1 = spark.read.parquet(dirs["out"])
    want1 = extract_stage(first)
    assert _triples_key_set(got1) == _triples_key_set(want1)

    # land MORE files; rerun — only new files are processed, no duplicates
    second.coalesce(2).write.mode("append").parquet(dirs["in"])
    q2 = stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    got2 = spark.read.parquet(dirs["out"])
    want2 = extract_stage(docs)
    assert _triples_key_set(got2) == _triples_key_set(want2)
    assert got2.count() == want2.count()  # exactly-once: no replays


def test_windowed_counts_from_events_dir(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    in_dir = str(tmp_path / "ev_in")
    events.coalesce(2).write.parquet(in_dir)
    q = stream_event_counts(
        spark, in_dir, events.schema, str(tmp_path / "ck"), query_name="evc2"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM evc2")
    want = windowed_event_counts(events)
    a = sorted(map(repr, got.collect()))
    b = sorted(map(repr, want.collect()))
    assert a == b and len(a) > 0
