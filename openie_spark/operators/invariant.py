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


def check_span_invariant(inp: DataFrame, out: DataFrame) -> dict:
    """Returns counts of violating docs in each direction; both must be 0.
    Implemented as exceptAll over (doc_id, fingerprint) pairs so duplicated
    doc_ids are also caught."""
    a = inp.select("doc_id", span_fingerprint_col().alias("fp"))
    b = out.select("doc_id", span_fingerprint_col().alias("fp"))
    missing = a.exceptAll(b).count()
    extra = b.exceptAll(a).count()
    return {"missing": missing, "extra": extra, "ok": missing == 0 and extra == 0}


def assert_span_invariant(inp: DataFrame, out: DataFrame) -> None:
    res = check_span_invariant(inp, out)
    if not res["ok"]:
        raise AssertionError(f"span-sequence invariant violated: {res}")
