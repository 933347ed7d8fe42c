"""Raw-file ingestion (the reference's per-document file-parsing surface,
re-expressed as table construction: files → DOC_SCHEMA rows).

The reference job walked a directory of per-document text files; the Spark
replacement ingests those layouts into the interleaved documents table once,
then every downstream operator works on the table.  Supported layouts:

  - JSONL: one document per line, ``{"doc_id": ..., "text": ...}`` or the
    full span shape ``{"doc_id": ..., "spans": [...]}``;
  - text dir: one document per file (doc_id = file name), read wholetext —
    Spark parallelizes over files, so a million-file corpus scans wide.

Both return DataFrames conforming to DOC_SCHEMA (flat text becomes a single
text span at offset 0 — the degenerate interleaving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _single_span(text_col) -> F.Column:
    # field order/types exactly match SPAN_SCHEMA; no cast — Spark cannot
    # cast between array types differing only in nullability
    return F.array(
        F.struct(
            F.lit("text").alias("kind"),
            text_col.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
    )


def ingest_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL → DOC_SCHEMA.  Lines carrying a full ``spans`` array pass
    through; flat ``text`` lines become a single text span."""
    read_schema = (
        "doc_id string, text string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>"
    )
    raw = spark.read.schema(read_schema).json(path)
    return raw.select(
        F.col("doc_id"),
        F.coalesce(F.col("spans"), _single_span(F.col("text"))).alias("spans"),
    )


def ingest_text_dir(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """Directory of one-file-per-document text → DOC_SCHEMA.

    ``wholetext`` keeps each file one row; doc_id is the file's path
    RELATIVE to ``path`` with the extension stripped.  Using the relative
    path (not just the base name) keeps DOC_SCHEMA's doc_id-unique contract
    when equal base names live in different subdirectories; extension-less
    files keep their full name instead of collapsing to an empty id.
    At 100 TB this layout is what the reference parsed serially per file —
    here the scan itself is the parallelism (one task per file group)."""
    raw = (
        spark.read.option("wholetext", "true")
        .text(f"{path}/{glob}")
        .withColumn("_file", F.input_file_name())
    )
    # input_file_name() yields a percent-ENCODED file URI, so the prefix to
    # strip is the root's own URI form (Path.as_uri applies the same
    # percent-encoding) — comparing against the raw path string would miss
    # any root containing spaces/special characters and leave the full URI
    # as the doc_id.  After stripping the anchored prefix, one trailing
    # extension is removed.  The remainder stays percent-encoded on
    # purpose: encoding is injective, so ids never collide, whereas
    # form-decoding (url_decode) maps '+' to ' ' and could merge distinct
    # names.  A miss leaves the input unchanged, so extension-less names
    # survive intact.
    from pathlib import Path as _Path

    prefix = _re_quote(_Path(path).resolve().as_uri() + "/")
    rel = F.regexp_replace(F.col("_file"), "^" + prefix, "")
    doc_id = F.regexp_replace(rel, r"\.[^./]+$", "")
    return raw.select(
        doc_id.alias("doc_id"),
        _single_span(F.col("value")).alias("spans"),
    )


def _re_quote(s: str) -> str:
    """Escape a literal path fragment for use inside a Java regex."""
    import re

    return re.escape(s)


def ingest_csv(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CSV with a header → DOC_SCHEMA (one text span per row).

    Columns bind BY HEADER NAME, not position: passing an explicit
    schema to a header CSV read makes Spark bind positionally and skip
    the header, so a reordered or extended header would silently swap
    doc ids and texts.  Reading header-aware with inference OFF keeps
    every column string-typed in ONE pass (no double scan), and the
    name-based select below fails loudly when the expected columns are
    absent.  Standard RFC-4180 quoting/escaping handles embedded commas
    and newlines (``multiLine`` on, so quoted documents may span
    physical lines; such files split per-file rather than per-block,
    the documented trade for correctness on free-text columns)."""
    raw = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    missing = [c for c in (id_col, text_col) if c not in raw.columns]
    if missing:
        raise ValueError(
            f"CSV header at {path!r} lacks column(s) {missing}; found {raw.columns}"
        )
    return raw.select(
        F.col(id_col).cast("string").alias("doc_id"),
        _single_span(F.coalesce(F.col(text_col).cast("string"), F.lit(""))).alias(
            "spans"
        ),
    )


__all__ = ["ingest_jsonl", "ingest_text_dir", "ingest_csv"]
