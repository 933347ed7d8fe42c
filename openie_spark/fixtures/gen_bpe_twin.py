"""Pure-Python single-process twin of the BPE merge learner — the oracle
side for ``bpe_merges`` (same fixture discipline as gen_dedup_twin).

Shares ONLY the frozen constants with the distributed path
(operators/bpe.py: BPE_MERGES, BPE_EOW, the whitespace-lower tokenization
rule, the (count desc, lexicographically-smallest-pair) tie-break, the
greedy leftmost merge application).  Everything the cluster does — the
word-frequency reduce, the pair-count groupBy, the aggregate() fold — is
INDEPENDENTLY re-executed here with plain dicts and lists, so a DuckDB
identity scan over this parquet pins every learned merge row value-hash
strict.

JVM-semantics mirror: tokenization is ``split(lower(text), '\\s+')`` with
empties filtered; Java ``\\s`` is ASCII-only, matching ``re.ASCII`` here
(corpus asserted ASCII, the gen_dedup_twin rule).  Character splitting is
``split(word, '')`` on the Spark side == ``list(word)`` for ASCII.
"""

from __future__ import annotations

import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from openie_spark.fixtures import store
from openie_spark.operators.bpe import BPE_EOW, BPE_MERGES

MERGES_PA = pa.schema(
    [
        pa.field("rank", pa.int64(), nullable=False),
        pa.field("lhs", pa.string(), nullable=False),
        pa.field("rhs", pa.string(), nullable=False),
        pa.field("n", pa.int64(), nullable=False),
    ]
)

_SPLIT_RE = re.compile(r"\s+", re.ASCII)


def _word_freq(sf_dir: str) -> dict[str, int]:
    table = pq.read_table(Path(sf_dir) / "documents.parquet", columns=["doc_id", "text"])
    freq: dict[str, int] = {}
    for rec in table.to_pylist():
        text = rec["text"] or ""
        if not text.isascii():
            raise ValueError(
                "bpe twin assumes ASCII text (JVM \\s is ASCII-only); "
                f"doc {rec['doc_id']} breaks that — revisit the mirror"
            )
        for tok in _SPLIT_RE.split(text.lower()):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    return freq


def _merge_seq(s: list[str], a: str, b: str) -> list[str]:
    """Greedy leftmost application — the aggregate() fold's semantics."""
    out: list[str] = []
    for x in s:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def merges_from_freq(freq: dict[str, int], merges: int = BPE_MERGES) -> list[dict]:
    """The merge-learning core over a word-frequency table — exposed so the
    fuzz gate (tests/unit/test_bpe.py) can replay arbitrary corpora without
    a parquet round-trip."""
    syms: list[tuple[list[str], int]] = [
        (list(w) + [BPE_EOW], n) for w, n in freq.items()
    ]
    rows: list[dict] = []
    for rank in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, n in syms:
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append({"rank": rank, "lhs": a, "rhs": b, "n": cnt})
        syms = [(_merge_seq(s, a, b), n) for s, n in syms]
    return rows


def bpe_merge_rows(sf_dir: str, merges: int = BPE_MERGES) -> list[dict]:
    return merges_from_freq(_word_freq(sf_dir), merges)


def bpe_merges_path(sf_dir: str) -> str:
    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    name = f"bpe_twin_v1_{Path(sf_dir).name}_{fp}"
    return store.ensure(
        name, lambda p: store.write_rows(bpe_merge_rows(sf_dir), MERGES_PA, p)
    )


TOKENS_PA = pa.schema(
    [
        pa.field("token", pa.string(), nullable=False),
        pa.field("total", pa.int64(), nullable=False),
    ]
)


def token_counts_from_freq(
    freq: dict[str, int], merges: int = BPE_MERGES, top: int | None = None
) -> list[dict]:
    """Encode a word-frequency table with the merges learned FROM IT and
    count the resulting subword tokens — the pure-Python core of the
    ``bpe_encode`` oracle (exposed for the fuzz gate, like
    merges_from_freq)."""
    rules = merges_from_freq(freq, merges)
    syms: list[tuple[list[str], int]] = [
        (list(w) + [BPE_EOW], n) for w, n in freq.items()
    ]
    for r in rules:
        syms = [(_merge_seq(s, r["lhs"], r["rhs"]), n) for s, n in syms]
    counts: dict[str, int] = {}
    for s, n in syms:
        for t in s:
            counts[t] = counts.get(t, 0) + n
    rows = [
        {"token": t, "total": c}
        for t, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    return rows[:top] if top is not None else rows


def bpe_tokens_path(sf_dir: str, merges: int = BPE_MERGES, top: int = 100) -> str:
    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    # parameters are part of the cache key: a bumped BPE_TOKEN_TOP /
    # BPE_MERGES (or a non-default caller) must not be served rows
    # computed under the old parameters (CLAUDE.md stale-fixture rule)
    name = f"bpe_tokens_twin_v1_m{merges}_t{top}_{Path(sf_dir).name}_{fp}"
    return store.ensure(
        name,
        lambda p: store.write_rows(
            token_counts_from_freq(_word_freq(sf_dir), merges, top), TOKENS_PA, p
        ),
    )
