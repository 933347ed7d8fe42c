"""Vocabulary build / corpus encoding / sequence packing
(operators/tokenization.py): deterministic id assignment, order-exact
encoding, and bin-boundary semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from openie_spark.operators.tokenization import (
    build_vocab,
    encode_docs,
    pack_sequences,
)


def test_vocab_rank_freq_then_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], "doc_id bigint, text string"
    )
    got = {r["token"]: (r["token_id"], r["freq"]) for r in build_vocab(df).collect()}
    # freqs: a=3, b=3, c=1, d=1 -> ties break lexicographically
    assert got == {"a": (1, 3), "b": (2, 3), "c": (3, 1), "d": (4, 1)}


def test_encode_preserves_position_order(spark):
    df = spark.createDataFrame([(1, "c a b a")], "doc_id bigint, text string")
    vocab = build_vocab(df)  # a=1 (freq 2), b=2, c=3
    r = encode_docs(df, vocab).collect()[0]
    assert r["n_tokens"] == 4
    assert r["ids_csv"] == "3,1,2,1"


def test_encode_case_and_whitespace_normalized(spark):
    df = spark.createDataFrame(
        [(1, "Foo  bar"), (2, "foo BAR")], "doc_id bigint, text string"
    )
    enc = {r["doc_id"]: r["ids_csv"] for r in encode_docs(df, build_vocab(df)).collect()}
    assert enc[1] == enc[2]


def test_pack_bins_and_offsets(spark):
    """Three 3-token docs into capacity-4 bins: starts at 0, 3, 6 ->
    bins 0, 0, 1; the second doc straddles the boundary but stays in
    its start bin."""
    rows = [(i, "x y z") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in pack_sequences(df, 4, bucket_width=2).collect()
    }
    assert got == {0: (0, 0), 1: (0, 3), 2: (1, 2)}


def test_pack_offsets_bounded_by_capacity(spark):
    rows = [(i, "tok " * (i % 7 + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pack_sequences(df, 16, bucket_width=8).collect()
    assert len(out) == 50
    assert all(0 <= r["bin_offset"] < 16 for r in out)
    # bin ids are non-decreasing in doc order
    by_id = [r["bin_id"] for r in sorted(out, key=lambda r: r["doc_id"])]
    assert by_id == sorted(by_id)
