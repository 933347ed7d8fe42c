"""Integer-exact Lloyd's k-means over int8-quantized embeddings — the
clustering member of the similarity family (Lloyd 1982; the int8 posture
of similarity.py's quantized ANN path).

Why integer: float k-means accumulates centroid sums in a join-order-
dependent way — never hash-comparable across engines (the same argument
as pagerank.py / hits.py).  Here every stage is exact int64 arithmetic:

  1. quantize vectors to int8 (similarity.quantize_embeddings — the
     one-home; elements in [-127, 127]);
  2. deterministic seeding: the k vectors with the smallest
     (portable_hash60(vec_id), vec_id) become centroids 0..k-1 in that
     order (hash-spread, reproducible, no RNG);
  3. assignment: nearest centroid by integer squared L2 distance,
     ties toward the smaller centroid id — realized on the Spark side as
     array_min over struct(dist, cid) (lexicographic struct order) and on
     the oracle side as arg_min on the fused priority
     dist·TIE_SCALE + cid (identical because dist ≥ 0 and cid < TIE_SCALE);
  4. update: per-dimension integer mean, TRUNCATED TOWARD ZERO (Spark
     div == DuckDB // semantics; the driver-side Python mirrors it with an
     explicit sign split because Python // floors — see
     tests/unit/test_intdiv_twin.py); clusters that lose every member
     keep their previous centroid (frozen).

Scale shape: the corpus is scanned once per iteration.  Assignment is a
pure codegen expression (k distance folds over literal centroid arrays —
no join, no Python).  The update aggregates per (cluster, dim) int64
sums/counts distributedly and collects exactly k·dim tiny rows to the
driver to rebuild the next round's literals — O(k·d) driver state,
data-size-independent (the same bounded-collect posture as the IVF
centroids, similarity.py).  max |dist| = d·254² ≈ 4.1e6 at d=64, so the
fused priority and all sums sit far inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.hashing import portable_hash60
from openie_spark.functions.lineage import cut_lineage
from openie_spark.operators.similarity import quantize_embeddings

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_TIE_SCALE = 1000  # > any cluster id; fuses (dist, cid) into one int


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division for non-negative ``b`` —
    the Python twin of Spark ``div`` / DuckDB ``//`` (Python ``//``
    floors, so negatives must be sign-split)."""
    return -((-a) // b) if a < 0 else a // b


def _dist_expr(centroid: list[int]):
    lits = F.array(*[F.lit(int(x)).cast("bigint") for x in centroid])
    return F.aggregate(
        F.zip_with("q_vec", lits, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda a, v: a + v,
    )


def kmeans_int8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """vectors(id, array<float>) → (vec_id, cluster, dist): the final
    assignment after ``iters`` exact-integer Lloyd rounds (dist = squared
    L2 in quantized units to the winning centroid).  Requires at least
    ``k`` input rows (seeding collects exactly k)."""
    q = cut_lineage(
        quantize_embeddings(vectors, vec_col, "q_vec").select(
            F.col(id_col).alias("vec_id"), "q_vec"
        ),
        eager=True,
    )
    seeds = (
        q.select(
            "vec_id",
            "q_vec",
            portable_hash60(F.col("vec_id").cast("string")).alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"k-means needs >= {k} vectors, got {len(seeds)}")
    cents: list[list[int]] = [list(r["q_vec"]) for r in seeds]
    dim = len(cents[0])

    def assign() -> DataFrame:
        scored = F.array(
            *[
                F.struct(
                    _dist_expr(c).alias("d"), F.lit(cid).cast("bigint").alias("c")
                )
                for cid, c in enumerate(cents)
            ]
        )
        best = F.array_min(scored)
        return q.select(
            "vec_id",
            best["c"].alias("cluster"),
            best["d"].alias("dist"),
            "q_vec",
        )

    for _ in range(iters):
        stats = (
            assign()
            .select("cluster", F.posexplode("q_vec").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()  # exactly k*dim tiny rows — data-size-independent
        )
        nxt = [list(c) for c in cents]  # empty clusters keep their centroid
        for r in stats:
            nxt[r["cluster"]][r["pos"]] = _trunc_div(int(r["s"]), int(r["n"]))
        cents = nxt
    return assign().select("vec_id", "cluster", "dist")
