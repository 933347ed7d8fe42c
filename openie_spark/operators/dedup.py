"""Deduplication suite for large-scale training-data pipelines.

All variants are shuffle-shaped for the 100 TB posture: no pairwise cross
products — every "pairs" operator goes through a blocking key (hash bucket,
LSH band, simhash chunk) and joins within buckets only.

  - exact:        content-hash groupBy (one shuffle, map-side combine)
  - minhash-LSH:  word-shingle MinHash → banded bucket join → exact-Jaccard
                  verify (same frozen scheme as entity linking)
  - simhash:      64-bit simhash; Hamming-≤k candidate pairs via the
                  pigeonhole chunk trick (k+1 chunks, equal-chunk join)
  - n-gram Jaccard: exact token-set similarity via explode + equi-join on
                  tokens (linear in postings, not quadratic in docs)
  - embedding cosine near-dup: see similarity.py (shares the ANN kernels)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from openie_spark.functions import minhash as mh
from openie_spark.functions.lineage import cut_lineage


MAX_MEMBERS = 100  # bound on the per-group members sample (see exact_dedup)


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, max_members: int = MAX_MEMBERS
) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min id.

    ``members`` is a bounded SAMPLE of the group (the ``max_members``
    smallest ids): an unbounded ``collect_list`` is an executor-OOM hazard
    at corpus scale — one pathological group (e.g. empty documents) can
    hold 10^8 ids.  The bound is enforced BEFORE aggregation with a
    window-rank filter, not by slicing the collected array (a post-hoc
    ``slice(collect_list(...))`` still materializes the whole group in the
    non-spillable agg buffer; the window sort, by contrast, spills).  The
    window and the groupBy share the same key, so Catalyst reuses ONE
    exchange — no extra shuffle.  ``group_size`` is always the exact full
    count (a full-partition window count, computed pre-filter); consumers
    needing every member of a giant group should anti-join the corpus
    against keepers instead of widening the cap."""
    from pyspark.sql.window import Window

    base = df.select(
        F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("_id")
    )
    w_ord = Window.partitionBy("content_hash").orderBy("_id")
    w_all = Window.partitionBy("content_hash")
    ranked = base.withColumn("_rn", F.row_number().over(w_ord)).withColumn(
        "_gs", F.count("*").over(w_all)
    )
    return (
        ranked.where(F.col("_rn") <= max_members)
        .groupBy("content_hash")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.max("_gs").alias("group_size"),
            F.sort_array(F.collect_list("_id")).alias("members"),
        )
    )


def word_shingles_col(text_col: str, n: int = 3):
    """Word n-gram shingles, JVM-side: split → sliding windows via
    transform(sequence(...)) → concat_ws → distinct."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(grams)


@pandas_udf(ArrayType(LongType()))
def _doc_band_keys_udf(shingle_arrays: pd.Series) -> pd.Series:
    """Doc-level MinHash band keys, numpy-vectorized across the Arrow batch
    (the 100 TB dedup hot path; bit-identical to the scalar path)."""
    lists = [list(a) if a is not None else [] for a in shingle_arrays]
    sigs = mh.signatures_batch(lists)
    keys = mh.band_keys_batch(sigs)
    return pd.Series(
        [k if lst else [] for k, lst in zip(keys, lists)],
        index=shingle_arrays.index,
    )


def minhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: shingle → sign → band → bucket join
    → exact-Jaccard verify.  Output (id_a, id_b, jaccard), id_a < id_b."""
    base = df.select(
        F.col(id_col).alias("id"), word_shingles_col(text_col).alias("sh")
    ).withColumn("bands", _doc_band_keys_udf("sh"))
    base = cut_lineage(base)
    # explode band keys WITHOUT the shingle arrays: carrying them through
    # the 16x-replicated band join multiplies shuffle bytes by the shingle
    # payload; candidate pairs are orders of magnitude fewer, so shingles
    # are re-joined only for the verify step
    exp = base.select("id", F.explode("bands").alias("band_key"))
    a = exp.select(F.col("id").alias("id_a"), "band_key")
    b = exp.select(F.col("id").alias("id_b"), "band_key")
    pairs = (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = base.select("id", "sh")
    return (
        pairs.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
HAMMING_K = 3  # candidate pairs within Hamming distance <= 3
N_CHUNKS = HAMMING_K + 1  # pigeonhole: some chunk must match exactly


def _simhash(tokens: list[str]) -> int:
    """Scalar oracle-reference SimHash (per-row Python).  NOT the hot path —
    kept as the spec the vectorized batch kernel is asserted bit-identical
    to (tests/unit/test_simhash_batch.py), same discipline as minhash.py."""
    if not tokens:
        return 0
    acc = [0] * SIMHASH_BITS
    for t in set(tokens):
        h = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
        )
        for i in range(SIMHASH_BITS):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            v |= 1 << i
    return v - (1 << 63)  # signed int64


_BIT_WEIGHTS = np.uint64(1) << np.arange(SIMHASH_BITS, dtype=np.uint64)


def _simhash_batch(
    texts: list[str | None], block_tokens: int = 1 << 19
) -> np.ndarray:
    """(n,) int64 SimHash signatures, numpy-vectorized across an Arrow
    batch; bit-identical to ``_simhash`` applied per row (empty docs → 0,
    matching the scalar sentinel).

    Kernel shape (the part that matters at 10^9 docs): each UNIQUE token is
    blake2b-hashed and bit-unpacked once (vocabulary-sized table); postings
    are vocab indices; the per-doc one-bit counts come from a segment sum
    computed in uint64 *byte lanes* — the 64 uint8 bit columns are viewed
    as 8 uint64 words, ``np.add.reduceat`` runs over 8 native-dtype columns
    (measured ~20x faster than reducing 64 uint8 columns with an upcast),
    and the per-byte partial sums are exact because a doc's unique-token
    count < 256 in the lane path (docs with ≥ 256 unique tokens take a
    per-doc numpy fallback).  ``acc = 2·ones − n_tokens`` then sign-pack.
    ``block_tokens`` bounds the posting working set (~64 MB) regardless of
    Arrow batch size."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    vocab: dict[str, int] = {}  # token → index into the unique-hash table
    uniq_hashes: list[int] = []
    idx_flat: list[int] = []  # vocab index per (doc, token) posting
    rows_l: list[int] = []
    counts_l: list[int] = []
    for r, t in enumerate(texts):
        toks = set((t or "").lower().split())
        if not toks:
            continue
        rows_l.append(r)
        counts_l.append(len(toks))
        for tok in toks:
            ix = vocab.get(tok)
            if ix is None:
                ix = len(uniq_hashes)
                vocab[tok] = ix
                uniq_hashes.append(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
            idx_flat.append(ix)
    if not rows_l:
        return out
    # unpack each UNIQUE hash once: little-endian uint64 bytes +
    # bitorder='little' → column k is exactly (h >> k) & 1, matching the
    # scalar loop's bit indexing
    hs_uniq = np.array(uniq_hashes, dtype="<u8")
    bits_uniq = np.unpackbits(
        hs_uniq.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    idx = np.array(idx_flat, dtype=np.int64)
    rows = np.array(rows_l, dtype=np.int64)
    counts = np.array(counts_l, dtype=np.int64)
    ends = np.cumsum(counts)
    d0 = 0
    while d0 < len(rows):
        # take documents until the posting budget fills (≥1 doc per block)
        base = int(ends[d0 - 1]) if d0 > 0 else 0
        d1 = int(np.searchsorted(ends, base + block_tokens, side="right"))
        d1 = max(d1, d0 + 1)
        starts = np.concatenate(([base], ends[d0 : d1 - 1])) - base
        seg_counts = counts[d0:d1]
        sel = bits_uniq[idx[base : ends[d1 - 1]]]  # (postings, 64) uint8
        if (seg_counts < 256).all():
            # byte-lane segment sum: 8 uint64 columns, no upcast copy
            part = np.add.reduceat(
                np.ascontiguousarray(sel).view(np.uint64), starts, axis=0
            )
            ones = part.view(np.uint8).reshape(d1 - d0, 64).astype(np.int64)
        else:  # rare: giant docs would overflow the byte lanes
            ones = np.empty((d1 - d0, 64), dtype=np.int64)
            for j in range(d0, d1):
                s = int(ends[j - 1]) if j > 0 else 0
                ones[j - d0] = bits_uniq[idx[s : ends[j]]].sum(
                    axis=0, dtype=np.int64
                )
        acc = 2 * ones - seg_counts[:, None]
        vals = ((acc > 0).astype(np.uint64) * _BIT_WEIGHTS).sum(
            axis=1, dtype=np.uint64
        )
        # v - 2^63 with uint64 wraparound == two's-complement reinterpret
        out[rows[d0:d1]] = (vals - (np.uint64(1) << np.uint64(63))).view(np.int64)
        d0 = d1
    return out


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return pd.Series(_simhash_batch(text.tolist()), index=text.index)


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = HAMMING_K
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature, pigeonhole chunk join
    (k+1 chunks of 16 bits), Hamming verify via bit_count(xor)."""
    sig = df.select(F.col(id_col).alias("id"), simhash_udf(text_col).alias("sig"))
    chunks = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright("sig", c * 16).bitwiseAND(F.lit(0xFFFF)).alias(
                            "chunk_val"
                        ),
                    )
                    for c in range(N_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", "ch.chunk_idx", "ch.chunk_val")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Exact token-set Jaccard pairs via the postings-join pattern: explode
    distinct tokens, self-join on token, count common, divide by union size.
    Linear in total postings; this is the exact (non-probabilistic) dedup
    path and the SQL-oracle-checkable one.

    High-document-frequency pruning (the 100 TB guard): the postings
    self-join is quadratic PER TOKEN GROUP — one stopword shared by 10^8
    docs is 10^16 candidate rows.  Tokens appearing in more than
    ``max_df_ratio`` of the documents are dropped from the token sets
    before the join (they contribute least to Jaccard discrimination —
    the prefix-filtering family of optimizations).  The high-DF token set
    is tiny by construction (bounded by 1/max_df_ratio distinct values
    carrying that much mass is impossible for most, in practice it is the
    stopword list), so it broadcasts and the prune is a broadcast
    anti-join, not a shuffle.  ``max_df_ratio >= 1.0`` disables pruning
    (pure full-set Jaccard)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias(
            "tok"
        ),
    ).where(F.col("tok") != "")
    if max_df_ratio < 1.0:
        n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
        hot_toks = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("dfr"))  # (id, tok) rows are distinct
            .crossJoin(F.broadcast(n_docs))
            .where(F.col("dfr") > F.floor(F.lit(max_df_ratio) * F.col("n_docs")))
            .select("tok")
        )
        toks = toks.join(F.broadcast(hot_toks), "tok", "left_anti")
    sizes = toks.groupBy("id").agg(F.count("*").alias("n_toks"))
    a = toks.select(F.col("id").alias("id_a"), "tok")
    b = toks.select(F.col("id").alias("id_b"), "tok")
    common = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_toks").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_toks").alias("nb")), "id_b")
        .withColumn(
            "jaccard", F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def near_dup_groups(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.8
) -> DataFrame:
    """Near-duplicate CLUSTERS, not just pairs: the MinHash-LSH pair graph
    is closed transitively with the same large-star/small-star connected
    components the KG canonicalizer uses, giving (id, keeper_id) for every
    document in a near-dup cluster (keeper = min id; singletons omitted).

    Cluster-level retention (keep the keeper, drop the rest) is the policy
    large training corpora actually apply — pairwise emission alone
    under-deduplicates transitive chains A~B~C where A and C never share a
    bucket.  All building blocks are the existing scale-shaped operators:
    banded bucket join for pairs, O(log n)-round DataFrame CC for closure.
    """
    from openie_spark.operators.components import connected_components

    pairs = minhash_dup_pairs(df, id_col, text_col, threshold)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components(edges).select(
        F.col("id").alias(id_col), F.col("rep").alias("keeper_id")
    )
