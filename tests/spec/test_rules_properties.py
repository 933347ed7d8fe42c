"""Property tests for the frozen rule set (spec/rules.py) — pure Python,
no Spark.  These pin the structural invariants the distributed pipeline
relies on, over randomized inputs."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from openie_spark.spec.lexicon import DET_SET
from openie_spark.spec.rules import (
    extract_document,
    extract_pairs,
    extract_sentence,
    normalize_mention,
    segment,
    tokenize,
)

words = st.sampled_from(
    "the a an acme corp vertex group hired owns ships fast old engineer "
    "factory parts river with from near and very quite it they".split()
)
sentences = st.lists(words, min_size=1, max_size=12).map(
    lambda ws: " ".join(ws) + "."
)


@settings(max_examples=300, deadline=None)
@given(sentences)
def test_triples_substrings_and_nonoverlap(sent):
    toks = tokenize(sent)
    for t in extract_sentence(sent, 0):
        # every emitted field is a contiguous token span of the sentence
        for surface in (t.subj, t.rel, t.arg):
            assert " ".join(tokenize(surface)) == surface
            joined = " ".join(toks)
            assert surface in joined
        assert t.conf == 1.0
        # normalization is idempotent and determiner-free at the front
        for norm in (t.subj_norm, t.arg_norm):
            assert normalize_mention(norm) == norm
            first = norm.split(" ", 1)[0]
            if " " in norm:
                assert first not in DET_SET


@settings(max_examples=200, deadline=None)
@given(st.lists(sentences, min_size=1, max_size=5))
def test_document_dedup_and_sent_idx(sents):
    """v3 dedup contract: base keys are globally unique; expanded keys are
    unique among themselves and never duplicate an EARLIER emission of
    either kind (a later base row may legitimately repeat an earlier
    expanded key — base dedup is blind to expanded keys by design)."""
    spans = [
        {"kind": "text", "text": " ".join(sents), "media_ref": None, "offset": 0}
    ]
    triples = extract_document(spans)
    base_keys = [(t.subj, t.rel, t.arg) for t in triples if t.conj == 0]
    assert len(base_keys) == len(set(base_keys))  # per-doc exact dedup
    seen_before: set = set()
    for t in triples:
        key = (t.subj, t.rel, t.arg)
        if t.conj:
            assert key not in seen_before
        seen_before.add(key)
    n_sents = len(segment(" ".join(sents)))
    for t in triples:
        assert 0 <= t.sent_idx < n_sents


@settings(max_examples=200, deadline=None)
@given(st.lists(sentences, min_size=1, max_size=4))
def test_media_spans_transparent(sents):
    """Interleaving media spans must not change the emitted triple set
    (sent_idx counters keep running; media contributes nothing)."""
    text_spans = [
        {"kind": "text", "text": s, "media_ref": None, "offset": 0} for s in sents
    ]
    with_media = []
    for i, sp in enumerate(text_spans):
        with_media.append(sp)
        with_media.append(
            {"kind": "image", "text": None, "media_ref": f"m://{i}", "offset": 0}
        )
    a = [(t.subj, t.rel, t.arg, t.sent_idx) for t in extract_document(text_spans)]
    b = [(t.subj, t.rel, t.arg, t.sent_idx) for t in extract_document(with_media)]
    assert a == b


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abc XY.!?' \n\t", max_size=60))
def test_segment_preserves_content(text):
    """Segmentation only splits on the frozen boundary regex — rejoining
    with single spaces loses at most the boundary whitespace."""
    segs = segment(text)
    for s in segs:
        assert s.strip()
    whole = re.sub(r"\s+", " ", " ".join(segs)).strip()
    norm_in = re.sub(r"\s+", " ", text).strip()
    # every segment is a substring of the input
    for s in segs:
        assert s in text
    # and nothing outside whitespace was dropped
    assert whole.replace(" ", "") == norm_in.replace(" ", "")


@settings(max_examples=100, deadline=None)
@given(st.lists(sentences, min_size=1, max_size=3))
def test_pairs_and_dicts_agree(sents):
    spans = [
        {"kind": "text", "text": s, "media_ref": None, "offset": 0} for s in sents
    ]
    assert extract_document(spans) == extract_pairs(
        (s["kind"], s["text"]) for s in spans
    )


@settings(max_examples=300, deadline=None)
@given(sentences)
def test_v3_deps_and_conj_invariants(sent):
    """v3 structural invariants over random sentences:
    - deps parse as label(h,d) with indices inside the sentence;
    - clause_type always equals the arc-pattern derivation;
    - every clause carries exactly one nsubj arc;
    - expanded rows exist only when a CONJ token is present, share their
      base row's rel/clause_type/deps, and their surfaces are proper
      sub-phrases of some base row's subj/arg."""
    from openie_spark.spec.rules import CONJ_SET, _type_from_arcs

    toks = tokenize(sent)
    n = len(toks)
    triples = extract_sentence(sent, 0)
    has_conj = any(t.lower() in CONJ_SET for t in toks)
    arc_re = re.compile(r"^[a-z]+\((\d+),(\d+)\)$")
    for t in triples:
        arcs = t.deps.split("|")
        labels = []
        for a in arcs:
            m = arc_re.match(a)
            assert m, a
            h, d = int(m.group(1)), int(m.group(2))
            assert 0 <= h < n and 0 <= d < n
            labels.append(a.split("(", 1)[0])
        assert labels.count("nsubj") == 1
        assert t.clause_type == _type_from_arcs(arcs)
    base = [t for t in triples if t.conj == 0]
    for t in triples:
        if t.conj:
            assert has_conj
            mates = [
                b
                for b in base
                if b.rel == t.rel
                and b.deps == t.deps
                and b.clause_type == t.clause_type
            ]
            assert mates
            assert any(
                t.subj in (b.subj, *b.subj.split())
                or t.subj in b.subj
                for b in mates
            )


@settings(max_examples=300, deadline=None)
@given(sentences)
def test_clause_type_invariants(sent):
    """v2 typing invariants: valid tag set; SV iff no argument; SVA iff the
    relation ends with a preposition (argful triples); SVC implies an
    all-copula relation; and the argful triple list equals what v1's scan
    would emit (additivity)."""
    from openie_spark.spec.lexicon import PREP_SET
    from openie_spark.spec.rules import CLAUSE_TYPES, COPULA_SET

    triples = extract_sentence(sent, 0)
    for t in triples:
        assert t.clause_type in CLAUSE_TYPES
        assert (t.arg == "") == (t.clause_type == "SV")
        assert (t.arg_norm == "") == (t.clause_type == "SV")
        if t.clause_type != "SV":
            assert (t.clause_type == "SVA") == (
                t.rel.split()[-1] in PREP_SET
            )
            if t.clause_type == "SVC":
                assert all(tok.lower() in COPULA_SET for tok in t.rel.split())


@settings(max_examples=300, deadline=None)
@given(sentences)
def test_hotpath_tagmap_and_normspan_equal_normative(sent):
    """The two hot-path specializations must be observationally identical
    to the normative bodies: _TAG_MAP.get(w, NOUN) == tag(w) for every
    token (incl. lexicon-overlap precedence), and _norm_span over any
    token slice == normalize_mention of the joined surface."""
    from openie_spark.spec.rules import NOUN, _TAG_MAP, _norm_span, tag

    toks = tokenize(sent)
    lows = [t.lower() for t in toks]
    for t, lo in zip(toks, lows):
        assert _TAG_MAP.get(lo, NOUN) == tag(t), t
    n = len(toks)
    for a in range(n):
        for b in range(a + 1, min(n, a + 4) + 1):
            surface = " ".join(toks[a:b])
            assert _norm_span(lows, a, b) == normalize_mention(surface), surface


def test_tagmap_covers_every_lexicon_word():
    """Exhaustive (the lexica are finite): the precedence-folded map agrees
    with tag() on the union of all five lexica."""
    from openie_spark.spec.lexicon import (
        ADJ_SET,
        ADV_SET,
        DET_SET,
        PREP_SET,
        VERB_SET,
    )
    from openie_spark.spec.rules import NOUN, _TAG_MAP, tag

    for w in VERB_SET | PREP_SET | DET_SET | ADJ_SET | ADV_SET:
        assert _TAG_MAP.get(w, NOUN) == tag(w), w


def test_normalize_mention_memo_is_transparent():
    """The memo layer must be observationally identical to the normative
    body — adversarial surfaces: determiners, unicode NFC compositions,
    whitespace runs, repeats (cache hits), and near-cap behavior."""
    from openie_spark.spec.rules import (
        _NORM_CACHE,
        _normalize_mention_uncached,
        normalize_mention,
    )

    cases = [
        "The Quick Fox",
        "the the double determiner",
        "  spaced\tout\n mention  ",
        "Cafe\u0301 Royale",  # decomposed: e + combining acute
        "Caf\u00e9 Royale",  # precomposed twin of the line above
        "A",
        "a b",
        "",
        "ACME CORP",
        "acme corp",
    ]
    for s in cases + cases:  # second pass exercises cache hits
        assert normalize_mention(s) == _normalize_mention_uncached(s), s
    # decomposed and precomposed spellings normalize identically
    assert normalize_mention("Cafe\u0301 Royale") == normalize_mention(
        "Caf\u00e9 Royale"
    )
    assert len(_NORM_CACHE) > 0
