"""RULESET v2 (ClausIE-style clause typing) gates.

v2 is normatively ADDITIVE over v1: same scan order, boundaries, resume
points and dedup — so the argful triple set (clause_type != 'SV') must be
byte-identical to the frozen v1 output.  The golden-corpus v1 count (2204)
stays pinned here as the legacy gate; the total v2 count (2683 = 2204 +
479 SV) is the new headline pin.
"""

from __future__ import annotations

from collections import Counter

from openie_spark.spec.lexicon import PREP_SET
from openie_spark.spec.rules import (
    CLAUSE_TYPES,
    COPULA_SET,
    RULESET_VERSION,
    extract_sentence,
)

V1_GOLDEN_COUNT = 2204
V2_GOLDEN_COUNT = 2683


def _golden_rows():
    """The v2-equivalent subset under v3: conj-expanded rows excluded (v3
    is additive over v2 exactly as v2 was over v1 — the conj=0 subset is
    pinned byte-identical; see tests/spec/test_ruleset_v3.py)."""
    from openie_spark.fixtures.gen_golden import golden_docs
    from openie_spark.spec.oracle import oracle_triples

    return [r for r in oracle_triples(golden_docs()) if r["conj"] == 0]


def test_version_is_at_least_v3():
    # the live version moved on; the v2 GATES below stay pinned forever
    assert RULESET_VERSION == "v3"


def test_v1_compat_pinned_on_golden_corpus():
    rows = _golden_rows()
    v1 = [r for r in rows if r["clause_type"] != "SV"]
    assert len(rows) == V2_GOLDEN_COUNT
    assert len(v1) == V1_GOLDEN_COUNT
    assert all(r["arg"] != "" and r["arg_norm"] != "" for r in v1)
    assert all(
        r["arg"] == "" and r["arg_norm"] == ""
        for r in rows
        if r["clause_type"] == "SV"
    )


def test_all_clause_types_exercised_on_golden_corpus():
    dist = Counter(r["clause_type"] for r in _golden_rows())
    assert set(dist) == set(CLAUSE_TYPES)
    for ct in CLAUSE_TYPES:
        assert dist[ct] > 0, ct


def test_clause_typing_rules():
    # SVA: relation extended to a preposition
    (t,) = extract_sentence("acme corp works with delta group.", 0)
    assert t.clause_type == "SVA" and t.rel == "works with"
    # SVC: pure copula run, no preposition
    (t,) = extract_sentence("the factory is big machinery.", 0)
    assert t.clause_type == "SVC" and t.rel == "is"
    # SVO: plain transitive verb
    (t,) = extract_sentence("acme corp hired an engineer.", 0)
    assert t.clause_type == "SVO"
    # SV: subject + verb, no argument NP anywhere to the right
    (t,) = extract_sentence("the old factory merged.", 0)
    assert t.clause_type == "SV" and t.arg == "" and t.arg_norm == ""
    assert t.subj == "the old factory"


def test_sva_iff_rel_ends_with_prep_for_argful():
    for r in _golden_rows():
        if r["clause_type"] == "SV":
            continue
        last = r["rel"].split()[-1]
        assert (r["clause_type"] == "SVA") == (last in PREP_SET), r
        if r["clause_type"] == "SVC":
            assert all(tok in COPULA_SET for tok in r["rel"].split()), r
