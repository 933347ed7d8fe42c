"""Deterministic MinHash + LSH banding (OP-31/32/33 core, SURVEY.md §2.4).

Shared by the Spark pandas UDF (operators/linking.py) and the pure-Python
oracle link computation, so both sides produce bit-identical signatures —
the linking P/R gate then measures only distributed-execution fidelity.

Scheme (frozen, MMDS ch.3):
  - shingles: character 3-grams of mention_norm (the whole string if
    len < 3), deduplicated;
  - base hash: first 8 bytes of blake2b(shingle) as uint64 (stable across
    processes — NOT Python's salted hash());
  - k = 64 permutations h_i(x) = (a_i * x + b_i) mod p, p = 2^61 - 1,
    a_i/b_i derived from sha256(f"kg-minhash-{i}") (a_i forced odd, nonzero);
  - banding: 16 bands x 4 rows; band key = blake2b of (band_idx, 4 sig
    values) as int64.

Not spark.ml.MinHashLSH: that keeps a JVM-random model object; this is
seed-frozen, dependency-light, and replicable in the oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np

K = 64
BANDS = 16
ROWS = K // BANDS
P = (1 << 61) - 1
JACCARD_THRESHOLD = 0.5


def _derive_params() -> tuple[np.ndarray, np.ndarray]:
    a = np.empty(K, dtype=np.uint64)
    b = np.empty(K, dtype=np.uint64)
    for i in range(K):
        d = hashlib.sha256(f"kg-minhash-{i}".encode()).digest()
        ai = int.from_bytes(d[:8], "big") % P
        bi = int.from_bytes(d[8:16], "big") % P
        a[i] = ai | 1  # odd, nonzero
        b[i] = bi
    return a, b


_A, _B = _derive_params()


def shingles(s: str, n: int = 3) -> list[str]:
    if len(s) < n:
        return [s] if s else []
    seen: dict[str, None] = {}
    for i in range(len(s) - n + 1):
        seen.setdefault(s[i : i + n])
    return list(seen)


def _base_hash(sh: str) -> int:
    return int.from_bytes(hashlib.blake2b(sh.encode(), digest_size=8).digest(), "big")


def signature(shingle_list: list[str]) -> np.ndarray:
    """k-dim MinHash signature as uint64 array; empty input → all p (sentinel)."""
    if not shingle_list:
        return np.full(K, P, dtype=np.uint64)
    x = np.array([_base_hash(s) % P for s in shingle_list], dtype=np.uint64)
    # (a*x + b) mod p in python-int space to avoid uint64 overflow: use object
    # math only at K*|shingles| scale per mention — vectorize via uint128 trick:
    # split a*x into high/low via np.uint64 multiply-with-carry is messy; the
    # shingle sets here are tiny (<100), so python ints are fine and exact.
    xs = x.tolist()
    out = np.empty(K, dtype=np.uint64)
    for i in range(K):
        ai = int(_A[i])
        bi = int(_B[i])
        out[i] = min(((ai * v + bi) % P) for v in xs)
    return out


def band_keys(sig: np.ndarray) -> list[int]:
    """16 int64 LSH bucket keys (band index baked into the hash)."""
    keys = []
    for b in range(BANDS):
        h = hashlib.blake2b(digest_size=8)
        h.update(b.to_bytes(2, "big"))
        h.update(sig[b * ROWS : (b + 1) * ROWS].tobytes())
        keys.append(int.from_bytes(h.digest(), "big", signed=False) - (1 << 63))
    return keys


def band_keys_for(s: str) -> list[int]:
    return band_keys(signature(shingles(s)))


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
