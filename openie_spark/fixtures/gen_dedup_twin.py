"""Pure-Python single-process twins of the MinHash-LSH / SimHash dedup
operators — the oracle side for ``minhash_dedup``, ``minhash_dedup_groups``
and ``simhash_dedup`` (same fixture discipline as gen_spec_triples).

The distributed path and this twin share ONLY the frozen hash constants:
the scalar MinHash spec (functions/minhash.py: shingle hash, permutation
params, band keys) and the scalar ``_simhash`` reference plus the blocking
constants (operators/dedup.py).  Everything the CLUSTER does around them —
JVM shingling, the 16x band explode + bucket equi-join, pair dedup,
exact-Jaccard / Hamming verify, and the large-star/small-star transitive
closure — is INDEPENDENTLY re-executed here with plain dicts, sets and
union-find.  A DuckDB identity scan over these parquets therefore pins
every pair/cluster row the distributed plan emits, value-hash strict.

Determinism note: both hash families are seed-frozen (blake2b / sha256
derived), so "probabilistic blocking" is still a pure function of the
corpus — rows-only was an under-claim for these three queries.

JVM-semantics mirror (the one non-Python input): ``word_shingles_col``
uses Spark ``split(lower(text), '\\s+')`` — Java regex split keeps
leading/trailing empty tokens at limit -1, exactly like ``re.split`` in
Python, and Java ``\\s`` is ASCII-only, which matches Python semantics on
this corpus (the generator's documents are ASCII; asserted below so a
non-ASCII regeneration fails loudly rather than silently diverging).
"""

from __future__ import annotations

import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from openie_spark.fixtures import store

MINHASH_PAIRS_PA = pa.schema(
    [
        pa.field("id_a", pa.int64(), nullable=False),
        pa.field("id_b", pa.int64(), nullable=False),
        pa.field("jaccard", pa.float64(), nullable=False),
    ]
)

GROUPS_PA = pa.schema(
    [
        pa.field("doc_id", pa.int64(), nullable=False),
        pa.field("keeper_id", pa.int64(), nullable=False),
    ]
)

SIMHASH_PAIRS_PA = pa.schema(
    [
        pa.field("id_a", pa.int64(), nullable=False),
        pa.field("id_b", pa.int64(), nullable=False),
        pa.field("hamming", pa.int32(), nullable=False),
    ]
)

_M64 = (1 << 64) - 1
_SPLIT_RE = re.compile(r"\s+", re.ASCII)


def _docs(sf_dir: str) -> list[tuple[int, str]]:
    table = pq.read_table(
        Path(sf_dir) / "documents.parquet", columns=["doc_id", "text"]
    )
    out = []
    for rec in table.to_pylist():
        text = rec["text"] or ""
        if not text.isascii():
            raise ValueError(
                "dedup twin assumes ASCII text (JVM \\s is ASCII-only); "
                f"doc {rec['doc_id']} breaks that — revisit the mirror"
            )
        out.append((int(rec["doc_id"]), text))
    return out


def _word_shingles(text: str, n: int = 3) -> set[str]:
    """Set twin of operators.dedup.word_shingles_col (JVM split keeps
    leading/trailing empties; short docs yield one whole-doc gram)."""
    toks = _SPLIT_RE.split(text.lower())
    top = max(len(toks) - n, 0)
    return {" ".join(toks[i : i + n]) for i in range(top + 1)}


def minhash_pair_rows(sf_dir: str, threshold: float = 0.8) -> list[dict]:
    from openie_spark.functions import minhash as mh

    docs = _docs(sf_dir)
    sh = {i: _word_shingles(t) for i, t in docs}
    buckets: dict[int, list[int]] = {}
    for i, _ in docs:
        s = sh[i]
        if not s:
            continue
        for k in mh.band_keys(mh.signature(list(s))):
            buckets.setdefault(k, []).append(i)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > 1:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
    rows = []
    for a, b in sorted(cand):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        j = inter / union  # same IEEE division as Spark's int/int -> double
        if j >= threshold:
            rows.append({"id_a": a, "id_b": b, "jaccard": j})
    return rows


def near_dup_group_rows(sf_dir: str, threshold: float = 0.8) -> list[dict]:
    """Union-find closure of the verified pair graph; keeper = min id;
    singletons (docs in no pair) omitted — the CC contract."""
    pairs = minhash_pair_rows(sf_dir, threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = p["id_a"], p["id_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for node in parent:
        comps.setdefault(find(node), []).append(node)
    rows = []
    for members in comps.values():
        keeper = min(members)
        for m in members:
            rows.append({"doc_id": m, "keeper_id": keeper})
    rows.sort(key=lambda r: r["doc_id"])
    return rows


def simhash_pair_rows(sf_dir: str, max_hamming: int | None = None) -> list[dict]:
    from openie_spark.operators.dedup import HAMMING_K, N_CHUNKS, _simhash

    if max_hamming is None:
        max_hamming = HAMMING_K
    docs = _docs(sf_dir)
    sig: dict[int, tuple[int, int]] = {}
    for i, t in docs:
        hi, lo = _simhash(list(set(t.lower().split())))
        sig[i] = (hi & _M64, lo & _M64)  # two's-complement bit views
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (uh, ul) in sig.items():
        for c in range(N_CHUNKS):
            src = ul if c < 2 else uh
            val = (src >> (32 * (c % 2))) & 0xFFFFFFFF
            buckets.setdefault((c, val), []).append(i)
    cand: set[tuple[int, int]] = set()
    for ids in buckets.values():
        if len(ids) > 1:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
    rows = []
    for a, b in sorted(cand):
        (ha, la), (hb, lb) = sig[a], sig[b]
        d = ((ha ^ hb).bit_count()) + ((la ^ lb).bit_count())
        if d <= max_hamming:
            rows.append({"id_a": a, "id_b": b, "hamming": d})
    return rows


def _key(tag: str, sf_dir: str) -> str:
    # content-fingerprinted on the documents input (the external,
    # driver-generated table) so a regenerated testdata set self-invalidates
    fp = store.file_fingerprint(Path(sf_dir) / "documents.parquet")
    return f"dedup_twin_{tag}_v1_{Path(sf_dir).name}_{fp}"


def minhash_pairs_path(sf_dir: str) -> str:
    return store.ensure(
        _key("minhash_pairs", sf_dir),
        lambda p: store.write_rows(minhash_pair_rows(sf_dir), MINHASH_PAIRS_PA, p),
    )


def near_dup_groups_path(sf_dir: str) -> str:
    return store.ensure(
        _key("groups", sf_dir),
        lambda p: store.write_rows(near_dup_group_rows(sf_dir), GROUPS_PA, p),
    )


def simhash_pairs_path(sf_dir: str) -> str:
    return store.ensure(
        _key("simhash_pairs", sf_dir),
        lambda p: store.write_rows(simhash_pair_rows(sf_dir), SIMHASH_PAIRS_PA, p),
    )
