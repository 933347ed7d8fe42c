"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:
  - brute-force cosine top-k — the exact baseline; JVM-side arithmetic via
    zip_with/aggregate (no Python in the hot path), broadcast of the query
    set, TakeOrdered per query.  Right answer for small query sets against
    huge corpora (scan-shaped, no index).
  - SRP-LSH (signed random projections) bucketed top-k — the scale path:
    hyperplane sign bits → banded bucket join → exact cosine only within
    buckets.  Recall < 1 by construction; band/bit counts trade recall for
    join fan-in.  Deterministic hyperplanes derived from sha256 seeds.

  - IVF (inverted-file) bucketed top-k — centroid cells as the blocking
    key (deterministic seed centroids, no RNG): corpus indexed into one
    cell, queries probe `nprobe` cells.  Adapts to clusterable corpora
    where SRP's data-oblivious hyperplanes lose recall.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

SRP_BITS = 64
SRP_BANDS = 8  # 8 bands x 8 bits
SRP_DIM = 64  # embedding dim of the driver table


def cosine_col(a: str, b: str):
    """JVM-side cosine similarity between two array<float/double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding self).
    queries is broadcast — the canonical 'small probe set vs huge corpus'
    shape; the corpus is scanned once, no shuffle until the per-query top-k
    (window over query_id, which AQE handles)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, bits: int = SRP_BITS) -> np.ndarray:
    """Deterministic Gaussian hyperplanes from sha256-seeded Generator."""
    seed = int.from_bytes(hashlib.sha256(b"kg-srp-lsh").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


_SRP_PER = SRP_BITS // SRP_BANDS
_SRP_MSB_W = np.uint64(1) << np.arange(_SRP_PER - 1, -1, -1, dtype=np.uint64)
_SRP_BAND_TAG = np.arange(SRP_BANDS, dtype=np.uint64) << np.uint64(32)


def srp_keys_scalar(v, dim: int = SRP_DIM) -> list[int]:
    """Scalar oracle-reference band keys (per-row Python).  NOT the hot
    path — the spec that the batch kernel below is asserted bit-identical
    to (tests/unit/test_similarity.py), same discipline as minhash.py."""
    planes = _hyperplanes(dim)
    x = np.asarray(v, dtype=np.float64)
    bits = (planes @ x) > 0
    out = []
    for b in range(SRP_BANDS):
        chunk = bits[b * _SRP_PER : (b + 1) * _SRP_PER]
        val = 0
        for bit in chunk:
            val = (val << 1) | int(bit)
        out.append((b << 32) | val)
    return out


def _srp_keys_batch(planes: np.ndarray, vecs: list) -> list[list[int]]:
    """Band keys for a whole Arrow batch: ONE (batch × dim) @ (dim × bits)
    matmul + vectorized MSB-first bit-pack, instead of a per-row matvec
    with a Python bit loop.  Rows that are null or of the wrong dimension
    get no keys (they can never be bucket candidates)."""
    n = len(vecs)
    out: list[list[int]] = [[] for _ in range(n)]
    dim = planes.shape[1]
    idx = [i for i, v in enumerate(vecs) if v is not None and len(v) == dim]
    if not idx:
        return out
    x = np.asarray([vecs[i] for i in idx], dtype=np.float64)
    bits = (x @ planes.T) > 0  # row i == planes @ x_i elementwise
    chunks = bits.reshape(len(idx), SRP_BANDS, _SRP_PER).astype(np.uint64)
    vals = (chunks * _SRP_MSB_W).sum(axis=2, dtype=np.uint64)
    keys = (vals | _SRP_BAND_TAG).view(np.int64)  # val < 2^32 → | == +
    for j, i in enumerate(idx):
        out[i] = keys[j].tolist()
    return out


def srp_band_keys_udf(dim: int):
    planes = _hyperplanes(dim)

    @pandas_udf(ArrayType(LongType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        return pd.Series(_srp_keys_batch(planes, vecs.tolist()), index=vecs.index)

    return _udf


def srp_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int = SRP_DIM,
) -> DataFrame:
    """Approximate top-k: exact cosine evaluated only within SRP buckets.
    Scale shape: band-key equi-join (shuffle bounded by bucket sizes), then
    per-query top-k."""
    keys = srp_band_keys_udf(dim)
    # corpus vectors are NOT carried through the 8x-replicated band join —
    # candidates are few, so vectors re-join after pair dedup
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(keys(vec_col)).alias("band_key"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(keys(vec_col)).alias("band_key"),
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cand = (
        q.join(c, "band_key")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(cvec, "neighbor_id")
        .withColumn("cosine", cosine_col("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-blocked alternative to SRP.
#
# Blocking key = nearest-centroid cell id: corpus vectors are indexed into
# exactly one cell, query vectors probe their `nprobe` nearest cells, exact
# cosine runs only within probed cells.  Centroid choice is a DETERMINISTIC
# seed selection (the n_centroids corpus vectors with the smallest
# (xxhash64(id), id) — partition-independent, no RNG, no iterative float
# averaging whose parallel summation order could drift between runs; the
# determinism-engineering rule SURVEY.md §4.2-G).  At the 10^9+ posture the
# centroid set stays a driver-side collect of n_centroids rows (√N-ish, still
# tiny) broadcast inside the UDF closure; assignment is one
# (batch × dim) @ (dim × n_centroids) matmul per Arrow batch.
# ---------------------------------------------------------------------------

IVF_N_CENTROIDS = 16
IVF_NPROBE = 2


def _ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> np.ndarray:
    """(n_centroids, dim) L2-normalized deterministic seed centroids."""
    seeds = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64("id"), F.asc("id"))
        .limit(n_centroids)
        .collect()
    )
    if not seeds:  # empty corpus → no cells (caller returns empty result)
        return np.zeros((0, 0), dtype=np.float64)
    c = np.asarray([[float(x) for x in r["v"]] for r in seeds], dtype=np.float64)
    norms = np.linalg.norm(c, axis=1)
    norms[norms == 0] = 1.0
    return c / norms[:, None]


def _ivf_cells_batch(cmat: np.ndarray, vecs: list, nprobe: int) -> list[list[int]]:
    """Top-`nprobe` nearest-centroid cell ids per vector for a whole Arrow
    batch — one matmul + stable argsort (ties → lower cell id).  Null /
    wrong-dimension rows get no cells."""
    n = len(vecs)
    out: list[list[int]] = [[] for _ in range(n)]
    dim = cmat.shape[1]
    idx = [i for i, v in enumerate(vecs) if v is not None and len(v) == dim]
    if not idx:
        return out
    x = np.asarray([vecs[i] for i in idx], dtype=np.float64)
    nx = np.linalg.norm(x, axis=1)
    nx[nx == 0] = 1.0
    sims = (x / nx[:, None]) @ cmat.T
    order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
    for j, i in enumerate(idx):
        out[i] = [int(c) for c in order[j]]
    return out


def ivf_cells_udf(cmat: np.ndarray, nprobe: int):
    from pyspark.sql.types import IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        return pd.Series(
            _ivf_cells_batch(cmat, vecs.tolist(), nprobe), index=vecs.index
        )

    return _udf


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = IVF_N_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Approximate top-k via inverted-file blocking: exact cosine only
    inside the query's `nprobe` nearest cells.  Scale shape identical to
    srp_topk — cell-key equi-join (shuffle bounded by cell sizes), corpus
    vectors re-joined only for the (few) candidates, per-query top-k
    window.  Higher recall than SRP when the corpus is clusterable (cells
    adapt to the data; hyperplanes don't)."""
    cmat = _ivf_centroids(corpus, id_col, vec_col, n_centroids)
    if cmat.shape[0] == 0:  # empty corpus → empty result, same schema
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

        # derive id dtypes from the inputs so the empty-corpus schema matches
        # the non-empty path for any id type (srp/brute derive types likewise)
        spark = corpus.sparkSession
        id_t = corpus.schema[id_col].dataType
        q_id_t = queries.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", q_id_t, True),
                    StructField("neighbor_id", id_t, True),
                    StructField("rank", IntegerType(), True),
                    StructField("cosine", DoubleType(), True),
                ]
            ),
        )
    probe = ivf_cells_udf(cmat, nprobe)
    index = ivf_cells_udf(cmat, 1)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe(vec_col)).alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(index(vec_col), 1).alias("cell"),
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cand = (
        q.join(c, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(cvec, "neighbor_id")
        .withColumn("cosine", cosine_col("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int = SRP_DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP blocking + exact verify."""
    keys = srp_band_keys_udf(dim)
    e = df.select(
        F.col(id_col).alias("id"), F.explode(keys(vec_col)).alias("band_key")
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    a = e.select(F.col("id").alias("id_a"), "band_key")
    b = e.select(F.col("id").alias("id_b"), "band_key")
    return (
        a.join(b, "band_key")
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .join(vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b")), "id_b")
        .withColumn("cosine", cosine_col("vec_a", "vec_b"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory/SIMD scale path for ANN.  At the
# 100 TB posture a float32 embedding corpus is 4x the size of its int8
# quantization; every ANN family above runs unchanged over quantized
# vectors with ~1/127 relative error per element.  All arithmetic below is
# exact INTEGER arithmetic (the pagerank discipline) so the quantized
# vectors are bit-identical across engines and the registry query can pin
# every element through an md5 of the vector:
#   1. milli-unit integerize:  v = round(x * 1000)::bigint
#   2. per-vector scale:       s = max(abs(v))            (0 for zero vecs)
#   3. quantize:               q = sign(v) * ((abs(v) * 127) div s)
# The sign split forces truncate-toward-zero semantics explicitly.  Spark
# `div` and DuckDB `//` both truncate toward zero on every sign (fuzz-
# pinned, tests/unit/test_intdiv_twin.py), so the split is a no-op between
# the two engines — but PYTHON `//` floors, and the pure-Python twin
# fixtures replay this formula, so the positive-only core is what keeps
# all three implementations in lockstep.
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_vec"
) -> DataFrame:
    """Add ``out_col`` (array<bigint>, every element in [-127, 127]) and
    ``scale_milli`` (the per-vector milli-unit max-abs) to ``df``.  Pure
    JVM higher-order functions — no UDF, stays in codegen."""
    milli = F.transform(
        vec_col, lambda x: F.round(x.cast("double") * 1000).cast("bigint")
    )
    df = df.withColumn("_vm", milli).withColumn(
        "scale_milli",
        F.coalesce(
            F.array_max(F.transform("_vm", lambda v: F.abs(v))), F.lit(0)
        ).cast("bigint"),
    )
    # Expression built via expr(): integral `div` is only reachable through
    # SQL syntax (python // on Columns is float division + floor).
    df = df.withColumn(
        out_col,
        F.expr(
            f"transform(_vm, v -> CASE WHEN scale_milli = 0 THEN 0L "
            f"WHEN v < 0 THEN -((-v) * {QUANT_LEVELS} div scale_milli) "
            f"ELSE (v * {QUANT_LEVELS}) div scale_milli END)"
        ),
    )
    return df.drop("_vm")


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over int8-QUANTIZED vectors, scored by the raw
    integer inner product — the memory-bound scan path: 4x less corpus
    bandwidth than float32 brute force, and because quantization and dot
    product are exact integer arithmetic the whole ranking is
    bit-identical across engines (the first fully oracle-checkable ANN
    ranking; ann_topk's float cosine needs micro-unit rounding).  Same
    plan shape as brute_force_topk: probe set broadcast, corpus scanned
    once, per-query top-k via window row_number (total order: score desc,
    id asc)."""
    c = quantize_embeddings(corpus, vec_col, "q_c").select(
        F.col(id_col).alias("neighbor_id"), "q_c"
    )
    q = quantize_embeddings(queries, vec_col, "q_q").select(
        F.col(id_col).alias("query_id"), "q_q"
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "dot_q",
            F.aggregate(
                F.zip_with("q_q", "q_c", lambda x, y: x * y),
                F.lit(0).cast("bigint"),
                lambda a, v: a + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "dot_q")
    )
