"""Source loaders (OP-01/02/03): driver star-schema tables and the
interleaved documents table, always with explicit schema contracts."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openie_spark.schemas import ALIAS_DICT_SCHEMA, DOC_SCHEMA

DRIVER_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """OP-02: load one driver parquet table."""
    if name not in DRIVER_TABLES:
        raise KeyError(name)
    return spark.read.parquet(str(Path(sf_dir) / f"{name}.parquet"))


def load_docs(spark: SparkSession, path: str) -> DataFrame:
    """OP-01: interleaved documents scan with the declared DOC_SCHEMA
    (production form is the Iceberg load behind catalog.py)."""
    return spark.read.schema(DOC_SCHEMA).parquet(path)


def load_alias_dict(spark: SparkSession, path: str) -> DataFrame:
    """OP-03: small dimension, loaded for broadcast (caller wraps in
    F.broadcast at the join site so the hint sits next to its use)."""
    return spark.read.schema(ALIAS_DICT_SCHEMA).parquet(path)


def text_spans(docs: DataFrame) -> DataFrame:
    """OP-11: array-level filter keeping only text spans — a higher-order
    function, NOT explode-filter-reassemble, so the (doc_id → spans) row
    shape survives and no shuffle is introduced."""
    return docs.select(
        "doc_id",
        F.filter("spans", lambda s: s["kind"] == F.lit("text")).alias("spans"),
    )
