"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in openie_spark/ (see SURVEY.md §2 for the operator
inventory; the registry module openie_spark/plans/registry.py holds the
queries + oracle SQL so they stay side-by-side and testable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over the interleaved sf0.001 documents —
    read docs → fused vectorized extraction UDF → triples → top relations."""
    from openie_spark.plans.registry import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from openie_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from openie_spark.plans.registry import build_oracle_sql

    return build_oracle_sql()
