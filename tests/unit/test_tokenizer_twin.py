"""Three-way gate for the tokenizer twin (CLAUDE.md invariant:
Spark ``split(lower(s), '\\s+')`` == Python ``re.split(r'\\s+', s.lower())``
with ``re.ASCII`` == DuckDB ``string_split_regex(lower(s), '\\s+')``).

Every text operator and its DuckDB oracle (dedup, ngrams, tfidf, quality,
vocab, domain_mix, dup_ngram_stats, ...) rides this equivalence; the twin
fixtures spell the Python side once (gen_dedup_twin._SPLIT_RE).  This file
makes the equivalence an explicit gate on the domain the corpus actually
occupies — printable ASCII without VT/FF — and PINS the two known
out-of-domain forks so a silent engine behavior change (or a corpus
generator change that wanders into fork territory) fails here with a
pointed message instead of as an opaque oracle hash mismatch:

  - ``\\x0b``/VT: Java and Python-ASCII ``\\s`` include it; DuckDB's RE2
    ``\\s`` is ``[\\t\\n\\f\\r ]`` and does NOT;
  - ``İ`` (U+0130): Python/Java lowercase to ``i`` + combining dot above
    (two code points); DuckDB lowercases to plain ``i``.
"""

from __future__ import annotations

import random
import re

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

_SPLIT = re.compile(r"\s+", re.ASCII)

# the corpus character domain: printable ASCII + the three whitespace
# characters all three engines agree on (space, tab, newline) + CR
_WS = [" ", "\t", "\n", "\r", "  ", " \t ", "\n\n"]
_WORD_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    ".,;:!?()[]'\"-_/|@#$%&*+=<>~`^{}"
)


def _rand_corpus_domain(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "  ", "\t", "a", " a ", "\na\r\n b\t"]
    while len(out) < n:
        parts = []
        for _ in range(rng.randint(0, 12)):
            parts.append(
                "".join(rng.choice(_WORD_CHARS) for _ in range(rng.randint(1, 10)))
            )
            parts.append(rng.choice(_WS))
        s = "".join(parts)
        out.append(rng.choice([s, " " + s, s + " ", s.strip()]))
    return out


def test_tokenizer_three_way_fuzz_on_corpus_domain(spark):
    cases = _rand_corpus_domain(300, seed=0x70CEA)
    got = {
        r["s"]: r["t"]
        for r in spark.createDataFrame([(s,) for s in cases], "s string")
        .select("s", F.split(F.lower(F.col("s")), r"\s+").alias("t"))
        .collect()
    }
    con = duckdb.connect()
    for s in set(cases):
        py = _SPLIT.split(s.lower())
        assert got[s] == py, f"spark vs python fork on {s!r}"
        dd = con.execute(r"SELECT string_split_regex(lower(?), '\s+')", [s]).fetchone()[0]
        assert dd == py, f"duckdb vs python fork on {s!r}"


def test_known_fork_vertical_tab_pinned(spark):
    # Java + Python-ASCII \s match \x0b; DuckDB's RE2 \s does not.  If any
    # side changes, the corpus-domain guard below is the wrong shape — revisit.
    s = "a\x0bb"
    spark_toks = (
        spark.createDataFrame([(s,)], "s string")
        .select(F.split(F.lower(F.col("s")), r"\s+").alias("t"))
        .collect()[0]["t"]
    )
    py = _SPLIT.split(s.lower())
    dd = duckdb.sql(r"SELECT string_split_regex(lower('a' || chr(11) || 'b'), '\s+')").fetchone()[0]
    assert spark_toks == py == ["a", "b"]
    assert dd == ["a\x0bb"], "DuckDB RE2 started splitting on VT — fork healed, update docs"


def test_known_fork_dotted_capital_i_pinned(spark):
    # Python/Java: 'İ'.lower() == 'i̇' (two code points); DuckDB: 'i'.
    s = "İ"
    spark_lower = (
        spark.createDataFrame([(s,)], "s string")
        .select(F.lower(F.col("s")).alias("l"))
        .collect()[0]["l"]
    )
    assert s.lower() == "i̇"
    assert spark_lower == "i̇", f"Spark lower(İ) changed: {spark_lower!r}"
    dd = duckdb.sql("SELECT lower('İ')").fetchone()[0]
    assert dd == "i", f"DuckDB lower(İ) changed: {dd!r} — fork healed, update docs"


def test_corpus_stays_inside_the_agreed_domain():
    # The equivalence above is only gated on ASCII-without-VT/FF input; a
    # corpus generator change that emits non-ASCII or VT/FF would cross
    # into fork territory invisibly.  Fail HERE, with the reason, instead.
    for sf in ("0.001", "0.01"):
        t = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet", columns=["text"]
        )
        for s in t.column("text").to_pylist():
            assert s.isascii(), f"sf{sf}: non-ASCII text crosses the lower() fork domain"
            assert "\x0b" not in s, (
                f"sf{sf}: VT reaches the DuckDB RE2 \\s fork"
            )
