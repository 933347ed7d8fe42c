"""OP-25 — span-sequence invariant checker (BASELINE.json input_hint).

After every document-touching transform, the per-document sequence
(kind, text, media_ref, order) must be byte-equal to the input.  `order` is
the array position; `offset` is ancillary and excluded.  The fingerprint is
computed entirely JVM-side (xxhash64 over an index-stamped re-projection of
the spans array — whole-stage-codegen friendly, no Python), so the check adds
one cheap column per side plus one anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_fingerprint_col(spans_col: str = "spans"):
    """xxhash64 over array<struct<kind,text,media_ref,order>>; NULL vs ''
    hash differently under xxhash64, preserving the distinction."""
    stamped = F.transform(
        spans_col,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.alias("order"),
        ),
    )
    return F.xxhash64(stamped)


def arrow_roundtrip(docs: DataFrame) -> DataFrame:
    """Identity pass through the TWO lineage hazards the pipeline actually
    exposes documents to: the executor Arrow round-trip (Spark → Arrow →
    Python → Arrow → Spark, where struct field order / null-vs-empty /
    utf8 normalization can silently drift on a version bump) and a hash
    shuffle repartition.  The in-run OP-25 gate compares the source against
    THIS lineage, so it checks two genuinely different computations instead
    of a projection of the input against itself."""

    def _identity(batches):
        yield from batches

    cols = docs.select("doc_id", "spans")
    return cols.mapInArrow(_identity, cols.schema).repartition("doc_id")


def check_span_invariant(inp: DataFrame, out: DataFrame) -> dict:
    """Returns counts of violating docs in each direction; both must be 0.

    Multiset semantics (duplicated doc_ids are caught): per-(doc_id, fp)
    counts on each side, full-outer joined, positive differences summed per
    direction — ONE job instead of two exceptAll passes (each of which
    scans both inputs)."""
    a = (
        inp.select("doc_id", span_fingerprint_col().alias("fp"))
        .groupBy("doc_id", "fp")
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        out.select("doc_id", span_fingerprint_col().alias("fp"))
        .groupBy("doc_id", "fp")
        .agg(F.count("*").alias("n_b"))
    )
    row = (
        a.join(b, ["doc_id", "fp"], "full_outer")
        .select(
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
        .agg(
            F.sum(F.greatest(F.col("n_a") - F.col("n_b"), F.lit(0))).alias("missing"),
            F.sum(F.greatest(F.col("n_b") - F.col("n_a"), F.lit(0))).alias("extra"),
        )
        .collect()[0]
    )
    missing = int(row["missing"] or 0)
    extra = int(row["extra"] or 0)
    return {"missing": missing, "extra": extra, "ok": missing == 0 and extra == 0}


def assert_span_invariant(inp: DataFrame, out: DataFrame) -> None:
    res = check_span_invariant(inp, out)
    if not res["ok"]:
        raise AssertionError(f"span-sequence invariant violated: {res}")
