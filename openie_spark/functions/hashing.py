"""Engine-portable hashing — the md5-lockstep family's single home.

    H(x) = int(md5(x)[:15 hex], 16)          -- 60 bits, fits int64
    Spark : conv(substr(md5(x),1,15),16,10)::long
    DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)

Every oracle-checked operator that needs a numeric hash (negative
sampling, MIS priorities, rolling fingerprints, sampling thresholds)
derives it from here so the scheme — and its DuckDB twin — can never
fork across call sites.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def portable_hash60(*cols) -> "F.Column":
    """60-bit engine-portable hash: md5 over '|'-joined inputs, first 15
    hex chars as a non-negative bigint.  For a single non-null string
    input, concat_ws is the identity, so H(col) == md5(col)[:15] on both
    engines.  DuckDB twin:
    CAST('0x' || substr(md5(concat_ws('|', ...)),1,15) AS BIGINT)."""
    joined = F.concat_ws(
        "|", *[F.col(c) if isinstance(c, str) else c for c in cols]
    )
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`portable_hash60` over ONE SQL expression
    (callers hashing several columns pass ``concat_ws('|', ...)`` to match
    the Spark side).  The single home of the ``'0x' || substr(md5(...))``
    spelling — oracle builders interpolate this instead of re-spelling it,
    so the two engines' hash schemes cannot fork (CLAUDE.md invariant)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Pure-Python XXH64 — the single-process twin of Spark's ``F.xxhash64`` on
# ONE string column (Spark hashes the UTF-8 bytes with seed 42).  Implemented
# from the public xxHash spec (Yann Collet, github.com/Cyan4973/xxHash,
# BSD-2); used by the linking-twin oracle fixture so minted entity ids are
# reproducible outside the JVM.  NOT a hot path — scalar oracle use only.
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED int64 — bit-identical to Spark's
    ``xxhash64(string_col)`` when ``data = s.encode('utf-8')`` (Spark's
    default seed is 42)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
