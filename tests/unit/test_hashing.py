"""functions/hashing.xxh64 — the pure-Python twin of Spark's xxhash64.

The linking-twin oracle fixture (gen_linking_twin) reproduces minted
entity ids with it, so this gate pins the twin bit-identical to the JVM
implementation across every length class of the XXH64 algorithm (empty,
<4, <8, <32, multi-stripe) plus multi-byte UTF-8."""

from pyspark.sql import functions as F

from openie_spark.functions.hashing import xxh64


def test_xxh64_matches_spark(spark):
    cases = [
        "",
        "a",
        "abc",
        "abcdefg",
        "hello world",
        "x" * 31,
        "y" * 32,
        "z" * 33,
        "w" * 100,
        "the quick brown fox jumps over the lazy dog",
        "ünïcödé ßtring 中文 🚀",
        "acme corporation",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])


def test_xxh64_seed_default_is_spark_seed():
    # Spark's xxhash64 uses seed 42; the twin must default to it.
    assert xxh64(b"spark") == xxh64(b"spark", seed=42)
    assert xxh64(b"spark", seed=0) != xxh64(b"spark", seed=42)
