"""Vocabulary construction, corpus encoding, and sequence packing — the
tokenize-and-pack tail of a training-data pipeline.

build_vocab: frequency-ranked token→id dictionary.  The ranking window is
GLOBAL but runs over the VOCABULARY (distinct tokens), not the corpus —
vocabulary size is sublinear in corpus size (Heaps' law) and bounded in
practice (50k-1M entries), so the single-partition window is over a table
that fits on one executor by construction; the corpus-sized work (the df
count) is a map-side-combinable groupBy.  Ties rank lexicographically so
the assignment is a total order (same vocab on any engine / any run).

encode_docs: token→id lookup via posexplode + broadcast join against the
vocab, reassembled in position order — the join formulation rather than a
map-literal lookup because a 1M-entry literal blows up the plan tree,
while a broadcast table is exactly what Spark distributes well.

pack_sequences: assign docs (in doc-id order) to fixed-capacity token
bins via the bucketed two-phase prefix sum (operators/prefix_sum.py):
bin_id = doc's cumulative start div capacity.  This is the deterministic
bin-boundary formulation — a doc whose tokens straddle a boundary stays
in its START bin, so a bin can overflow by at most (max doc len − 1)
tokens; real packers then truncate or pad, which is a per-row map.  The
greedy first-fit alternative is sequentially dependent (non-associative)
and cannot be expressed as a scan — this formulation is the one that
parallelizes, and it is exact-integer, so the DuckDB oracle replays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openie_spark.operators.prefix_sum import bucketed_prefix_sum
from openie_spark.operators.text_analysis import tokens_col


def build_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, token_id, freq), token_id = 1-based rank by (freq desc,
    token asc).  Corpus-scale work is one groupBy; the ranking window is
    vocabulary-bounded (see module docstring)."""
    toks = df.select(F.explode(tokens_col(text_col)).alias("token")).where(
        F.col("token") != ""
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    return freq.withColumn("token_id", F.row_number().over(w).cast("long")).select(
        "token", "token_id", "freq"
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_tokens, ids_csv): each doc's token-id sequence in
    position order as a comma-joined string (flat + engine-portable; the
    typed array form is `split(ids_csv, ',')`).  Unknown tokens cannot
    occur when vocab came from build_vocab on the same corpus; a foreign
    vocab drops unknowns (inner join) — the standard OOV-filter choice."""
    pos = df.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "token")
    ).where(F.col("token") != "")
    joined = pos.join(F.broadcast(vocab.select("token", "token_id")), "token")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "token_id"))),
                    lambda s: s["token_id"].cast("string"),
                ),
            ).alias("ids_csv"),
        )
    )


def pack_sequences(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 65536,
) -> DataFrame:
    """(id_col, n_tokens, bin_id, bin_offset): docs in id order packed
    into `capacity`-token bins; bin_id is the bin containing the doc's
    FIRST token, bin_offset its position inside that bin.  See module
    docstring for the boundary-straddle semantics."""
    d = df.select(
        F.col(id_col),
        F.size(F.filter(tokens_col(text_col), lambda t: t != F.lit(""))).alias(
            "n_tokens"
        ),
    )
    cum = bucketed_prefix_sum(d, id_col, "n_tokens", bucket_width, out_col="cum")
    start = F.col("cum") - F.col("n_tokens")
    return cum.select(
        id_col,
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {capacity}").alias("bin_id"),
        (start - F.expr(f"((cum - n_tokens) div {capacity}) * {capacity}")).alias(
            "bin_offset"
        ),
    )
