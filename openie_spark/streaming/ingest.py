"""Structured Streaming surface (SURVEY.md §2.12 extension).

The north rule's job is batch (spark-submit, checkpoint resume), and the
batch checkpoint table (plans/checkpoint.py) already gives incremental
semantics.  This module provides the equivalent *streaming* form for
deployments that prefer it:

  - ``stream_extract``: file-source incremental ingest of the interleaved
    documents table → the SAME fused extraction stage (stateless, so the
    exact batch operator runs unchanged on a stream) → parquet sink with a
    streaming checkpoint.  ``Trigger.AvailableNow`` drains everything
    currently present then stops — the streaming twin of a resumable batch
    run: re-running after new files land processes ONLY the new files
    (source offsets live in the checkpoint), with exactly-once file-sink
    semantics.
  - ``stream_event_counts``: watermarked tumbling-window aggregation over
    an event stream (late data bounded by the watermark).

Both are exercised in tests/unit/test_streaming.py against their batch
equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openie_spark.operators.extract import extract_stage
from openie_spark.schemas import DOC_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental documents→triples ingest; returns the started query.

    Caller awaits termination.  With availableNow the query drains the
    backlog and stops; rerunning picks up only newly-landed files."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    triples = extract_stage(docs)
    return (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation — works identically on a
    stream (late rows beyond the watermark dropped) and on a batch frame
    (the tests' equivalence oracle)."""
    # watermarks require TIMESTAMP (with timezone); parquet written as NTZ
    # (the driver tables are) is normalized here — session tz is UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def stream_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "event_counts",
):
    """File-source streaming variant writing to an in-memory sink (complete
    mode) — the smallest end-to-end watermarked-aggregation harness."""
    events = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(events)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
