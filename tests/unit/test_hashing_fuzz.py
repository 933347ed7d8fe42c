"""Seeded fuzz gates for the cross-engine hash twins (functions/hashing.py).

The fixed-case pins in test_hashing.py cover every xxHash length class;
this file adds breadth: a few hundred seeded-random inputs per run (same
seed every run — deterministic, no flaky surface) across

  - ``xxh64`` (pure-Python) vs Spark's ``F.xxhash64`` on STRING columns,
    mixing ASCII, Latin-1, CJK, and astral-plane code points so multi-byte
    UTF-8 falls on every stripe boundary;
  - ``xxh64`` over 8-byte little-endian SIGNED values vs ``F.xxhash64`` on
    a BIGINT column — the encoding the ANN/IVF twin fixtures rely on
    (gen_ann_twin.py seeds + minted ids) but which the fixed-case file
    never pinned directly;
  - ``portable_hash60`` three ways: the Spark Column, the interpolated
    DuckDB SQL twin (``portable_hash60_sql``), and the raw
    ``int(md5[:15], 16)`` definition — incl. multi-column concat_ws
    inputs, so the '|' join convention cannot fork either.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60, portable_hash60_sql, xxh64

_ALPHABETS = [
    "abcdefghijklmnopqrstuvwxyz ",
    "ABCdef0123456789|,;:-_/",
    "àéîõü ßñç",
    "中文漢字かなカナ한글",
    "🚀🎉😀𝔘𝔫𝔦",
]


def _rand_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = [""]
    while len(out) < n:
        alpha = rng.choice(_ALPHABETS)
        length = rng.choice([1, 2, 3, 4, 7, 8, 15, 16, 31, 32, 33, rng.randint(0, 200)])
        out.append("".join(rng.choice(alpha) for _ in range(length)))
    return out


def test_xxh64_string_fuzz_vs_spark(spark):
    cases = _rand_strings(400, seed=0xC0FFEE)
    df = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert xxh64(r["s"].encode("utf-8")) == r["h"], repr(r["s"])


def test_xxh64_bigint_fuzz_vs_spark(spark):
    rng = random.Random(0xBEEF)
    vals = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63), 2**31, -(2**31) - 1]
    vals += [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    for r in df.collect():
        assert xxh64(int(r["v"]).to_bytes(8, "little", signed=True)) == r["h"], r["v"]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def test_portable_hash60_three_way_fuzz(spark):
    # single column: Spark Column vs DuckDB twin vs raw definition
    cases = [s for s in _rand_strings(200, seed=0x5EED) if "\x00" not in s]
    df = spark.createDataFrame([(s,) for s in cases], "s string").select(
        "s", portable_hash60("s").alias("h")
    )
    con = duckdb.connect()
    for r in df.collect():
        expect = _md5_60(r["s"])
        assert r["h"] == expect, repr(r["s"])
        got = con.execute(
            f"SELECT {portable_hash60_sql('?')}", [r["s"]]
        ).fetchone()[0]
        assert got == expect, repr(r["s"])


def test_portable_hash60_multicol_matches_concat_ws_twin(spark):
    rows = [("acme", "corp", 7), ("", "x", -3), ("a|b", "c", 0), ("中文", "🚀", 99)]
    df = spark.createDataFrame(rows, "a string, b string, k long").select(
        "a",
        "b",
        "k",
        portable_hash60("a", "b", F.col("k").cast("string")).alias("h"),
    )
    con = duckdb.connect()
    sql_twin = portable_hash60_sql("concat_ws('|', ?, ?, CAST(? AS VARCHAR))")
    for r in df.collect():
        expect = _md5_60("|".join([r["a"], r["b"], str(r["k"])]))
        assert r["h"] == expect
        got = con.execute(f"SELECT {sql_twin}", [r["a"], r["b"], r["k"]]).fetchone()[0]
        assert got == expect
