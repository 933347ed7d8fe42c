"""SemDeDup-style semantic pruning over int8-quantized embeddings —
cluster with exact-integer k-means, then prune near-duplicate neighbors
within each cluster (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

Declared semantics (the DuckDB oracle in plans/registry.py mirrors them
clause-for-clause):

  * vectors quantize and cluster exactly as the ``kmeans`` query
    (operators/kmeans.py — deterministic seeding, KMEANS_ITERS Lloyd
    rounds, integer arithmetic throughout);
  * two SAME-CLUSTER vectors are NEAR when their quantized cosine
    exceeds SEM_THRESH_NUM/SEM_THRESH_DEN, spelled as the exact integer
    test ``dot > 0 AND dot^2 * DEN^2 > NUM^2 * |a|^2 * |b|^2`` (all
    int64-safe: |dot| <= 64 * 127^2 ~ 1.03e6, so dot^2 * 16 ~ 1.7e13);
  * the KEEPER of a near-dup neighborhood is the vector FARTHEST from
    its centroid (the paper's low-centroid-similarity rule), made total
    by the id tie-break: x is PRUNED iff some near neighbor y has
    (y.dist > x.dist) OR (y.dist = x.dist AND y.vec_id < x.vec_id).
    Exactly one side of every near pair dominates, so at least one
    member of every neighborhood survives, deterministically.

Scale shape (100 TB): k-means cost is the corpus scanned ITERS times
(see kmeans.py for the two bit-identical assignment plans).  The pair
stage is an equi-join on cluster id — per-cluster all-pairs, exactly the
published recipe, where k is the scale knob (SemDeDup runs
k ~ n/avg_cluster_size).  ``k=None`` resolves adaptively:
k = max(KMEANS_K, ceil(n / target_cluster_size)), so the expected
per-cluster pair population is bounded by target_cluster_size² no matter
the corpus size — the knob is a callable parameter, not a doc note
(tests/unit/test_kmeans.py fuzzes the bound; the DuckDB oracle computes
the same k inside the SQL).  The dominance rule is a single aggregate
over the directed pair frame — no transitive closure, no iteration."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage
from openie_spark.operators.kmeans import KMEANS_TARGET_CLUSTER_SIZE, kmeans_int8
from openie_spark.operators.similarity import quantize_embeddings

SEM_THRESH_NUM = 1
SEM_THRESH_DEN = 4  # near when quantized cosine > 1/4


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def semantic_prune(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    target_cluster_size: int = KMEANS_TARGET_CLUSTER_SIZE,
) -> DataFrame:
    """vectors(id, array<float>) → (vec_id, cluster, dist, n_neighbors,
    pruned): the per-vector prune verdict (pruned = 0/1 bigint;
    n_neighbors = same-cluster near-duplicate count).  ``k`` /
    ``target_cluster_size`` are the SemDeDup scale knob (see module
    docstring); the defaults resolve k adaptively from the corpus size."""
    assign = cut_lineage(
        kmeans_int8(
            vectors, id_col, vec_col, k=k, target_cluster_size=target_cluster_size
        ),
        eager=True,
    )  # (vec_id, cluster, dist) — the oracle-checked clustering
    q = quantize_embeddings(vectors, vec_col, "q_vec").select(
        F.col(id_col).alias("vec_id"), "q_vec"
    )
    m = assign.join(q, "vec_id").withColumn("norm2", _dot("q_vec", "q_vec"))
    x = m.select(
        "cluster",
        F.col("vec_id").alias("x_id"),
        F.col("q_vec").alias("x_vec"),
        F.col("norm2").alias("x_n2"),
        F.col("dist").alias("x_dist"),
    )
    y = m.select(
        "cluster",
        F.col("vec_id").alias("y_id"),
        F.col("q_vec").alias("y_vec"),
        F.col("norm2").alias("y_n2"),
        F.col("dist").alias("y_dist"),
    )
    num2 = SEM_THRESH_NUM * SEM_THRESH_NUM
    den2 = SEM_THRESH_DEN * SEM_THRESH_DEN
    pairs = (
        x.join(y, "cluster")
        .where(F.col("x_id") != F.col("y_id"))
        .withColumn("dot", _dot("x_vec", "y_vec"))
        .withColumn(
            "near",
            (F.col("dot") > 0)
            & (
                F.col("dot") * F.col("dot") * F.lit(den2)
                > F.lit(num2) * F.col("x_n2") * F.col("y_n2")
            ),
        )
        .withColumn(
            "dominated",
            F.col("near")
            & (
                (F.col("y_dist") > F.col("x_dist"))
                | (
                    (F.col("y_dist") == F.col("x_dist"))
                    & (F.col("y_id") < F.col("x_id"))
                )
            ),
        )
        .groupBy(F.col("x_id").alias("vec_id"))
        .agg(
            F.sum(F.col("near").cast("bigint")).alias("n_neighbors"),
            F.max(F.col("dominated").cast("bigint")).alias("pruned"),
        )
    )
    return (
        m.select("vec_id", "cluster", "dist")
        .join(pairs, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            "dist",
            F.coalesce("n_neighbors", F.lit(0)).cast("bigint").alias("n_neighbors"),
            F.coalesce("pruned", F.lit(0)).cast("bigint").alias("pruned"),
        )
        .orderBy("vec_id")
    )
