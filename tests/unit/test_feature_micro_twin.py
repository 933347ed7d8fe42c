"""Direct fuzz gate for the feature-vector serialization one-home
(multimodal.feature_micro_col vs its Python twin feature_micro).

The media oracle queries pin the pair transitively (hash-match on the
fixture corpus); this file pins it directly on seeded random float32
vectors across the feature domain — negatives (floor, not trunc, on both
sides), sub-micro magnitudes (quantize to 0 or -1, not symmetric!),
large-but-in-domain magnitudes, and exact tie points of the
``floor(x*1e6 + 0.5)`` grid."""

from __future__ import annotations

import numpy as np
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

from openie_spark.operators.multimodal import feature_micro, feature_micro_col


def _vectors(seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    out = [
        [],
        [0.0],
        [-0.0],
        [1.0, -1.0],
        # sub-micro magnitudes: floor(+eps*1e6+0.5)=0 but floor(-eps*1e6+0.5)
        # is 0 only until eps*1e6 > 0.5 — the asymmetry worth pinning
        [4.9e-7, -4.9e-7, 5.1e-7, -5.1e-7, 1e-9, -1e-9],
        # exact grid ties: x*1e6 + 0.5 integral (double arithmetic)
        [0.0000005, -0.0000005, 0.0000015, -0.0000015],
    ]
    for dim in (1, 3, 16, 64):
        for scale in (1.0, 1e-4, 1e3):
            out.append(
                (rng.standard_normal(dim) * scale).astype(np.float32).tolist()
            )
    return out


def test_feature_micro_twin_fuzz(spark):
    vecs = _vectors(seed=0xFEA7)
    schema = StructType([StructField("v", ArrayType(FloatType()))])
    rows = (
        spark.createDataFrame([(v,) for v in vecs], schema)
        .select("v", feature_micro_col("v").alias("q"))
        .collect()
    )
    assert len(rows) == len(vecs)
    for r in rows:
        assert r["q"] == feature_micro(r["v"]), r["v"]


def test_feature_micro_negative_asymmetry_documented():
    # floor-based micro-quantization is NOT symmetric around zero:
    # +0.49 micro-units -> 0 but -0.51 micro-units -> -1 (never "-0")
    assert feature_micro([4.9e-7]) == "0"
    assert feature_micro([-5.1e-7]) == "-1"
