"""RULESET v3 gates: dependency-arc layer + arc-derived clause typing +
conjunction expansion.

v3 is normatively ADDITIVE over v2: the conj=0 row subset must be
byte-identical to the frozen v2 output (same scan order, boundaries, resume
points and base dedup; clause typing now DERIVED from the arc pattern must
reproduce the v2 heuristic types exactly).  Golden-corpus pins: v3 total
2687 = 2683 v2 rows + 4 conjunction expansions (all from the doc-794 edge
case); v1 subset 2204 unchanged.
"""

from __future__ import annotations

from collections import Counter

from openie_spark.spec.rules import (
    CONJ_SET,
    RULESET_VERSION,
    _type_from_arcs,
    extract_pairs,
    extract_sentence,
)

V1_GOLDEN_COUNT = 2204
V2_GOLDEN_COUNT = 2683
V3_GOLDEN_COUNT = 2687  # + 4 conj expansions
V2_TYPE_DIST = {"SVA": 1410, "SVO": 730, "SV": 479, "SVC": 64}


def _golden_rows():
    from openie_spark.fixtures.gen_golden import golden_docs
    from openie_spark.spec.oracle import oracle_triples

    return oracle_triples(golden_docs())


def test_version_is_v3():
    assert RULESET_VERSION == "v3"
    assert CONJ_SET == {"and", "or"}


def test_v3_pins_on_golden_corpus():
    rows = _golden_rows()
    base = [r for r in rows if r["conj"] == 0]
    conj = [r for r in rows if r["conj"] == 1]
    assert len(rows) == V3_GOLDEN_COUNT
    assert len(base) == V2_GOLDEN_COUNT
    assert len([r for r in base if r["clause_type"] != "SV"]) == V1_GOLDEN_COUNT
    assert dict(Counter(r["clause_type"] for r in base)) == V2_TYPE_DIST
    # the 4 expansions all come from the hand-built doc-794 edge case
    assert {r["doc_id"] for r in conj} == {"g00794"}
    assert {(r["subj"], r["rel"], r["arg"]) for r in conj} == {
        ("alice", "founded", "acmeco"),
        ("alice", "founded", "bobtech"),
        ("acmeco", "joined", "quartz labs"),
        ("bobtech", "joined", "quartz labs"),
    }


def test_every_row_carries_arcs_and_typing_matches_arcs():
    """clause_type must equal the arc-pattern derivation for EVERY golden
    row — the dependency layer IS the typing, not a parallel heuristic."""
    for r in _golden_rows():
        assert r["deps"], r
        arcs = r["deps"].split("|")
        assert r["clause_type"] == _type_from_arcs(arcs), r
        labels = {a.split("(", 1)[0] for a in arcs}
        assert "nsubj" in labels, r  # every clause has a subject arc


def test_arc_shapes_per_clause_type():
    # SVA: nsubj + obl + case on the trailing preposition
    (t,) = extract_sentence("acme corp works with delta group.", 0)
    labels = [a.split("(", 1)[0] for a in t.deps.split("|")]
    assert t.clause_type == "SVA"
    assert "obl" in labels and "case" in labels and "obj" not in labels
    # SVC: copular — complement heads the clause, cop arc to the copula
    (t,) = extract_sentence("the factory is big machinery.", 0)
    assert t.clause_type == "SVC"
    labels = [a.split("(", 1)[0] for a in t.deps.split("|")]
    assert "cop" in labels and "obj" not in labels and "obl" not in labels
    # SVO: plain transitive
    (t,) = extract_sentence("acme corp hired an engineer.", 0)
    assert t.clause_type == "SVO"
    assert "obj(" in t.deps and "det(" in t.deps
    # SV: subject-only — nsubj and nothing argful
    (t,) = extract_sentence("the old factory merged.", 0)
    assert t.clause_type == "SV"
    labels = {a.split("(", 1)[0] for a in t.deps.split("|")}
    assert labels & {"obj", "obl", "cop"} == set()
    # aux: multi-verb run heads at the last verb
    ts = extract_sentence("the plant was opened in april.", 0)
    assert any("aux(" in t.deps for t in ts)


def test_conjunction_expansion_subject_and_argument():
    out = extract_sentence("alice and bob founded acme corp and delta labs.", 0)
    base = [t for t in out if t.conj == 0]
    exp = [t for t in out if t.conj == 1]
    assert len(base) == 1
    assert base[0].subj == "alice and bob"
    assert base[0].arg == "acme corp and delta labs"
    # cross product of conjuncts minus the base combination: 2*2 - 1 = 3
    assert {(t.subj, t.arg) for t in exp} == {
        ("alice", "acme corp"),
        ("alice", "delta labs"),
        ("bob", "acme corp"),
        ("bob", "delta labs"),
    } - {("alice and bob", "acme corp and delta labs")}
    assert all(t.clause_type == base[0].clause_type for t in exp)
    # cc + conj arcs present on the shared deps string
    assert "conj(" in base[0].deps and "cc(" in base[0].deps


def test_conjunction_requires_noun_in_every_segment():
    # 'and' with no noun on one side must NOT split (e.g. trailing conj)
    out = extract_sentence("alice and founded acme.", 0)
    assert all(t.conj == 0 for t in out)


def test_sv_subject_conjunction_expansion():
    out = extract_sentence("alice and bob merged.", 0)
    base = [t for t in out if t.conj == 0]
    exp = [t for t in out if t.conj == 1]
    assert len(base) == 1 and base[0].clause_type == "SV"
    assert base[0].subj == "alice and bob"
    assert {t.subj for t in exp} == {"alice", "bob"}
    assert all(t.arg == "" and t.clause_type == "SV" for t in exp)


def test_expanded_dedup_never_masks_base_rows():
    """An expanded row emitted early must not suppress a LATER base row
    with the same key (base dedup is blind to expanded keys) — the
    additivity guarantee."""
    spans = [
        ("text", "alice and bob founded acme."),  # expands to (alice, founded, acme)
        ("text", "alice founded acme."),          # base row, SAME key
    ]
    rows = extract_pairs(spans)
    base_keys = [(t.subj, t.rel, t.arg) for t in rows if t.conj == 0]
    assert ("alice", "founded", "acme") in base_keys  # base row survived
    # and the expanded duplicate of sentence 1 was emitted exactly once
    all_keys = [(t.subj, t.rel, t.arg) for t in rows]
    assert all_keys.count(("alice", "founded", "acme")) == 2  # conj + base


def test_expanded_rows_dedup_among_themselves():
    spans = [
        ("text", "alice and bob founded acme."),
        ("text", "alice and bob founded acme together."),  # same expansions
    ]
    rows = extract_pairs(spans)
    exp_keys = [(t.subj, t.rel, t.arg) for t in rows if t.conj == 1]
    assert len(exp_keys) == len(set(exp_keys))
