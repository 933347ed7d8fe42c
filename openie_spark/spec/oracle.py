"""spec/oracle.py — the single-process executable specification.

Stands in for the absent krullgit/openIE reference (SURVEY.md §0): a pure
Python, dependency-free implementation of the frozen rule set (see
rules.RULESET_VERSION) over a list of documents in the input_hint shape.  The distributed pipeline's triples are
compared against this oracle's triples on the frozen golden corpus; the
target P/R >= 0.95 (BASELINE.json metric) is expected to be exactly 1.0
because both implement the same frozen rules.

The oracle also computes the reference-side of the span-sequence invariant
(BASELINE.json input_hint): the per-document (kind, text, media_ref, order)
sequence every transform must preserve byte-equal.
"""

from __future__ import annotations

import hashlib
import json

from openie_spark.spec.lexicon import LEXICON_SHA256
from openie_spark.spec.rules import RULESET_VERSION, Triple, extract_document


def oracle_triples(docs: list[dict]) -> list[dict]:
    """docs: [{doc_id: str, spans: [{kind, text, media_ref, offset}, ...]}]
    Returns flat triple rows in deterministic (doc order, extraction order).
    """
    rows: list[dict] = []
    for doc in docs:
        for t in extract_document(doc["spans"]):
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "sent_idx": t.sent_idx,
                    "subj": t.subj,
                    "rel": t.rel,
                    "arg": t.arg,
                    "subj_norm": t.subj_norm,
                    "arg_norm": t.arg_norm,
                    "conf": t.conf,
                    "clause_type": t.clause_type,
                    "deps": t.deps,
                    "conj": t.conj,
                    "ruleset": RULESET_VERSION,
                }
            )
    return rows


def span_sequence(doc: dict) -> list[tuple]:
    """The invariant tuple sequence: (kind, text, media_ref, order).
    'order' is the array position; `offset` is ancillary metadata."""
    return [
        (s.get("kind"), s.get("text"), s.get("media_ref"), i)
        for i, s in enumerate(doc["spans"])
    ]


def span_fingerprint(doc: dict) -> str:
    """Canonical sha256 of the span sequence; '' and NULL stay distinct."""
    return hashlib.sha256(
        json.dumps(span_sequence(doc), ensure_ascii=False).encode()
    ).hexdigest()


def precision_recall(
    pipeline: set[tuple], golden: set[tuple]
) -> tuple[float, float]:
    """Set P/R over triple identity tuples (doc_id, subj, rel, arg)."""
    if not pipeline and not golden:
        return 1.0, 1.0
    tp = len(pipeline & golden)
    p = tp / len(pipeline) if pipeline else 0.0
    r = tp / len(golden) if golden else 0.0
    return p, r


__all__ = [
    "oracle_triples",
    "span_sequence",
    "span_fingerprint",
    "precision_recall",
    "Triple",
    "RULESET_VERSION",
    "LEXICON_SHA256",
]
