"""L1 unit tests for the multimodal plumbing (operators/multimodal.py).

Decode kernels are deterministic stubs (no codecs in the container); what
these tests pin down is the real Spark surface: posexplode provenance,
mapInPandas schema/batch shape, nullability by kind, determinism."""

from __future__ import annotations

import pytest

from openie_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_FEATURES_SCHEMA,
    media_feature_stage,
    media_spans,
)
from openie_spark.sources.tables import load_docs


@pytest.fixture(scope="module")
def docs(spark, golden_docs_path):
    return load_docs(spark, golden_docs_path)


def test_media_spans_provenance(spark, docs):
    """Every non-text span appears exactly once with its array position."""
    m = media_spans(docs)
    rows = m.collect()
    assert all(r["kind"] != "text" for r in rows)
    from pyspark.sql import functions as F

    n_media = docs.select(
        F.sum(
            F.size(F.filter("spans", lambda s: s["kind"] != F.lit("text")))
        ).alias("n")
    ).collect()[0]["n"]
    assert len(rows) == n_media
    # span_pos must index into the original array (kind matches)
    sample = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select("doc_id", "pos", "s.kind").where(F.col("kind") != "text")
    expect = {(r["doc_id"], r["pos"]) for r in sample.collect()}
    assert {(r["doc_id"], r["span_pos"]) for r in rows} == expect


def test_feature_stage_schema_and_nullability(spark, docs):
    feats = media_feature_stage(docs)
    assert feats.schema == MEDIA_FEATURES_SCHEMA
    rows = feats.collect()
    assert rows
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        if r["kind"] == "image":
            assert r["width"] is not None and r["height"] is not None
            assert r["duration_ms"] is None
        elif r["kind"] == "audio":
            assert r["duration_ms"] is not None
            assert r["width"] is None
        assert r["n_bytes"] > 0


def test_feature_stage_deterministic(spark, docs):
    a = sorted(map(repr, media_feature_stage(docs).collect()))
    b = sorted(map(repr, media_feature_stage(docs).collect()))
    assert a == b


def test_resize_images(spark, docs):
    from openie_spark.operators.multimodal import (
        RESIZED_SCHEMA,
        fetch_media_bytes,
        resize_images,
    )

    media = fetch_media_bytes(media_spans(docs))
    out = resize_images(media, max_side=128)
    assert out.schema == RESIZED_SCHEMA
    rows = out.collect()
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    for r in rows:
        assert max(r["thumb_w"], r["thumb_h"]) <= 128
        # aspect preserved within integer truncation
        assert abs(r["width"] / r["height"] - r["thumb_w"] / r["thumb_h"]) < 0.25
        assert len(r["thumb"]) > 0


def test_sample_frames(spark, docs):
    from openie_spark.operators.multimodal import (
        FRAMES_SCHEMA,
        fetch_media_bytes,
        sample_frames,
    )

    media = fetch_media_bytes(media_spans(docs))
    out = sample_frames(media, every_ms=500, max_frames=4)
    assert out.schema == FRAMES_SCHEMA
    rows = out.collect()
    assert rows
    by_span: dict = {}
    for r in rows:
        by_span.setdefault((r["doc_id"], r["span_pos"]), []).append(r)
    for frames in by_span.values():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(idxs)))  # contiguous from 0
        assert len(idxs) <= 4
        for f in frames:
            assert f["ts_ms"] == f["frame_idx"] * 500
            assert len(f["feature"]) == 16
