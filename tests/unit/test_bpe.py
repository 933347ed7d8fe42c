"""BPE merge learning (operators/bpe.py): hand-pinned merges on the
classic corpus, greedy-leftmost application, tie-break totality,
twin-fixture equality on a synthetic parquet, determinism across
parallelism."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from openie_spark.fixtures.gen_bpe_twin import _merge_seq, bpe_merge_rows
from openie_spark.operators.bpe import (
    BPE_EOW,
    _apply_merge,
    learn_bpe_merges,
    word_frequencies,
)


def _learn(spark, texts, merges):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [tuple(r) for r in learn_bpe_merges(df, merges=merges).collect()]


def test_classic_low_lower_corpus(spark):
    # 3x "low", 1x "lower": the most frequent pair is (l, o) with weight 4
    got = _learn(spark, ["low low low lower"], 3)
    assert got[0] == (1, "l", "o", 4)
    assert got[1] == (2, "lo", "w", 4)
    # after (lo,w): "low" = [low, </w>] x3+1; best is (low, </w>) weight 3
    assert got[2] == (3, "low", BPE_EOW, 3)


def test_tie_break_lexicographic_smallest(spark):
    # "ab" and "cd" both occur twice → pairs (a,b), (c,d), (b,</w>), (d,</w>)
    # all weight 2; the lexicographically smallest pair (a,b) must win
    got = _learn(spark, ["ab cd ab cd"], 1)
    assert got == [(1, "a", "b", 2)]


def test_greedy_leftmost_application(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "s array<string>")
    out = df.select(_apply_merge(F.col("s"), "a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "a"]
    assert _merge_seq(["a", "a", "a"], "a", "a") == ["aa", "a"]


def test_word_frequencies_rule(spark):
    df = spark.createDataFrame([("The  the\tcat",), ("cat",)], "text string")
    got = {r["word"]: r["n"] for r in word_frequencies(df).collect()}
    assert got == {"the": 2, "cat": 2}


def test_matches_twin_on_synthetic_parquet(spark, tmp_path):
    rows = [
        {"doc_id": 1, "text": "spark shuffle spark scan"},
        {"doc_id": 2, "text": "shuffle spark shuffle"},
        {"doc_id": 3, "text": "scan scan batch"},
    ]
    schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("text", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp_path / "documents.parquet")
    want = [
        (r["rank"], r["lhs"], r["rhs"], r["n"])
        for r in bpe_merge_rows(str(tmp_path), merges=6)
    ]
    df = spark.createDataFrame([(r["text"],) for r in rows], "text string")
    got = [tuple(r) for r in learn_bpe_merges(df, merges=6).collect()]
    assert got == want and len(got) == 6


def test_deterministic_across_parallelism(spark):
    texts = [f"tok{i % 7} tok{(i * 3) % 5} join scan merge" for i in range(40)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    a = [tuple(r) for r in learn_bpe_merges(df.repartition(1), merges=5).collect()]
    b = [tuple(r) for r in learn_bpe_merges(df.repartition(4), merges=5).collect()]
    assert a == b and len(a) == 5


def test_fuzz_spark_learner_matches_twin(spark):
    """L4b-style fuzz gate: seeded random corpora over a tiny alphabet
    (forcing dense merge interactions — runs of repeated chars, shared
    prefixes) must produce bit-identical merge tables from the Spark
    learner and the pure-Python twin core."""
    import random
    import re

    from openie_spark.fixtures.gen_bpe_twin import merges_from_freq

    for seed in (7, 23, 101):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("aab") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(20, 40))
        ]
        text = " ".join(words)
        freq: dict[str, int] = {}
        for tok in re.split(r"\s+", text.lower(), flags=re.ASCII):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
        want = [
            (r["rank"], r["lhs"], r["rhs"], r["n"])
            for r in merges_from_freq(freq, merges=6)
        ]
        df = spark.createDataFrame([(text,)], "text string")
        got = [tuple(r) for r in learn_bpe_merges(df, merges=6).collect()]
        assert got == want, f"seed {seed}: {got} != {want}"


def test_encode_matches_twin_fuzz(spark):
    """Encoded-token counts from the Spark path and the pure-Python twin
    core must be bit-identical on fuzzed corpora (the bpe_encode oracle's
    machinery)."""
    import random
    import re

    from openie_spark.fixtures.gen_bpe_twin import token_counts_from_freq
    from openie_spark.operators.bpe import bpe_encode_tokens

    for seed in (5, 41):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(15, 30))
        ]
        text = " ".join(words)
        freq: dict[str, int] = {}
        for tok in re.split(r"\s+", text.lower(), flags=re.ASCII):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
        want = [
            (r["token"], r["total"])
            for r in token_counts_from_freq(freq, merges=6, top=50)
        ]
        df = spark.createDataFrame([(text,)], "text string")
        got = [
            tuple(r) for r in bpe_encode_tokens(df, merges=6, top=50).collect()
        ]
        assert got == want, f"seed {seed}"
