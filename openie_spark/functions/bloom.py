"""DataFrame-native Bloom filter for pre-shuffle join pruning (Bloom 1970;
the same move as Spark's AQE runtime bloom filter, SPARK-32268, exposed as
a library operator because `bloom_filter_agg` is not a public routine).

Why: at the 100 TB posture the expensive part of ``big ⋈ small`` is
shuffling the BIG side; when the join is selective, most shuffled rows
match nothing.  A Bloom filter built from the small side's keys and
evaluated map-side on the big side drops the non-matching rows BEFORE the
exchange — no false negatives, so ``bloom prune → exact join`` is
bit-identical to the plain join (the property the oracle checks).

Scale shape:
  - BUILD is distributed: k probe positions per key (xxhash64 seeded by
    the probe index), groupBy(byte index) + bit_or — one map-side-
    combinable aggregation over the SMALL side.  The only driver-side
    artifact is the finished ``m_bits/8``-byte filter (65 KiB for the
    1 Mbit default), independent of data size — the IVF-centroid
    precedent (similarity.py), not a data-proportional collect.
  - PROBE is a pure JVM expression (hex/conv/bitwiseAND over a binary
    literal): no UDF, no explode, no join, stays inside WholeStageCodegen,
    evaluated before the shuffle so pushdown survives.

Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k; the 1 Mbit / k=5
default holds ~1% at n = 100k keys.  Build cost is O(n·k); callers with
bigger small sides pass a bigger ``m_bits`` (the filter is still tiny
relative to a shuffle of the big side).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BloomFilter:
    m_bits: int
    k: int
    data: bytes  # m_bits/8 bytes, little-endian bit order within a byte


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def _bit_mask(bit: Column) -> Column:
    """1 << bit for bit in 0..7 — shiftleft() only takes a literal shift,
    so use an 8-element lookup (element_at is 1-based)."""
    return F.element_at(
        F.array(*[F.lit(1 << i) for i in range(8)]), bit.cast("int") + 1
    )


def build_bloom(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> BloomFilter:
    """Distributed build over ``keys[key_col]`` (duplicates are free)."""
    if m_bits % 8 != 0:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    )
    masks = (
        pos.select(
            (F.col("p") / 8).cast("long").alias("byte_idx"),
            _bit_mask(F.col("p") % 8).alias("bit"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    buf = bytearray(m_bits // 8)
    for r in masks:
        buf[r["byte_idx"]] = r["mask"]
    return BloomFilter(m_bits=m_bits, k=k, data=bytes(buf))


def might_contain(bf: BloomFilter, col: Column) -> Column:
    """JVM-side membership probe: AND of k single-bit tests against the
    binary literal.  False positives possible, false negatives never."""
    lit = F.lit(bf.data)
    cond = F.lit(True)
    for p in _positions(col, bf.m_bits, bf.k):
        byte = F.substr(lit, (p / 8).cast("long") + 1, F.lit(1))
        mask = _bit_mask(p % 8)
        cond = cond & (
            F.conv(F.hex(byte), 16, 10).cast("int").bitwiseAND(mask) != 0
        )
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """``big LEFT SEMI JOIN small ON key`` with a Bloom prune of the big
    side before the shuffle.  Output is bit-identical to the plain semi
    join (equality-gated in tests AND by the registry oracle); the win is
    the shuffle volume of the big side at low match rates."""
    bf = build_bloom(small, key, m_bits=m_bits, k=k)
    pruned = big.where(might_contain(bf, F.col(key)))
    return pruned.join(small.select(key).distinct(), key, "left_semi")
