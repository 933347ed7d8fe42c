"""The lineage-cut seam must be semantics-preserving in every mode —
``local`` (sandbox default), ``persist`` (fault-tolerant clusters), and
``none`` — so the fault-tolerance/performance trade is config-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openie_spark.functions.lineage import CONF_KEY, cut_lineage
from openie_spark.operators.skew import hot_keys


@pytest.mark.parametrize("mode", ["local", "persist", "none"])
def test_cut_lineage_modes_preserve_results(spark, mode):
    spark.conf.set(CONF_KEY, mode)
    try:
        df = spark.range(100).withColumn("k", F.pmod("id", F.lit(7)))
        cut = cut_lineage(df, eager=True)
        assert cut.count() == 100
        assert cut.groupBy("k").count().count() == 7
        # hot_keys goes through the seam internally
        skewed = spark.range(100).select(
            F.when(F.col("id") < 60, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), F.col("id"))
            ).alias("k")
        )
        assert hot_keys(skewed, "k", 0.1) == ["hot"]
    finally:
        spark.conf.unset(CONF_KEY)
