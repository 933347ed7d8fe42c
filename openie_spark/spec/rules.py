"""Rule set v3 — the frozen executable specification of triple extraction.

This module is the stand-in for the absent reference (SURVEY.md §0): the
reference tree at /root/reference was empty, so "match the reference's
emitted (subj, pred, obj) triples" is operationalized as matching THIS frozen,
pure-Python, dependency-free rule set.  Both sides of the P/R comparison run
it: spec/oracle.py applies it per document in a single process; the Spark
pipeline applies it inside vectorized pandas UDFs (openie_spark/operators/
extract.py).  Any P/R < 1.0 therefore indicates a distributed-pipeline bug
(Arrow round-trip, partition ordering, dedup divergence), never a modeling
difference.

Pattern family is public knowledge: the relation pattern ``V+ (W* P)?`` is
the ReVerb design (Fader, Soderland, Etzioni, EMNLP 2011); NP chunking
``DET? ADJ* NOUN+`` is standard shallow chunking; clause-split framing is
ClausIE (Del Corro & Gemulla, WWW 2013).

NORMATIVE v3 EXTENSION over v2 (deterministic dependency-arc layer — the
"POS/dependency-pattern" capability the north rule names; head-finding
conventions follow Universal Dependencies guidelines, public knowledge):
  - every clause is assembled into a DEPENDENCY ARC LIST before typing:
      nsubj(head, subj_head)        — clause subject arc
      obj / obl+case / cop          — argument attachment by clause shape
      aux(v_last, v_j)              — auxiliary verbs in a V+ run (head =
                                      last verb of the run, UD convention)
      det/amod/advmod/compound      — NP- and relation-internal arcs
                                      (NP head = rightmost noun)
      cc/conj                       — coordination inside an NP (CONJ_SET)
      mark                          — trailing preposition with no argument
    serialized into the ``deps`` column as '|'-joined ``label(h,d)`` with
    sentence-relative token indices, in construction order.
  - clause_type is now DERIVED FROM THE ARC PATTERN (obl → SVA, cop → SVC,
    obj → SVO, else SV) instead of inline POS heuristics; the arc-assembly
    conditions mirror the v2 heuristics exactly, so typing is unchanged on
    every v2 row (pinned by tests/spec/test_ruleset_v3.py).
  - CONJUNCTION EXPANSION (NEW EMISSION): when a subject or argument NP
    contains a coordination (token in CONJ_SET splitting the NP into >= 2
    segments that each contain a non-conjunction NOUN), one additional
    triple is emitted per conjunct combination (subject-major, argument-
    minor order), tagged ``conj = 1`` (base rows carry ``conj = 0``).
    Expanded rows are deduped against everything emitted EARLIER in the
    document (base or expanded), but base-row dedup NEVER consults
    expanded keys — so the ``conj = 0`` subset of v3 is byte-identical to
    v2's output (the same additivity discipline as v1→v2).
  - v3 golden-corpus pins: tests/spec/test_ruleset_v3.py.

NORMATIVE v2 EXTENSION over v1 (ClausIE-style clause typing, Del Corro &
Gemulla WWW 2013; the SURVEY.md §2.3 deferred item):
  - every triple carries a ``clause_type`` tag:
      SVC  — the V+ run consists entirely of copulas (COPULA_SET below) and
             the relation did not extend to a preposition (complement);
      SVA  — the relation extended to a preposition (last_p, adverbial /
             prepositional argument);
      SVO  — any other verb + argument NP (direct object);
      SV   — NEW EMISSION: a subject NP was found left of the verb but no
             argument NP exists right of the relation (intransitive);
             arg = '' and arg_norm = '' (SV facts never become KG edges —
             edges are binary — but are kept in the triples table).
  - v2 is ADDITIVE over v1: scan order, boundaries, resume points and
    dedup are unchanged, so the (subj, rel, arg) set with SV rows removed
    is byte-identical to v1's output (pinned by
    tests/spec/test_ruleset_v2.py: 2204 v1 triples on the golden corpus).

NORMATIVE v1 FREEZE (unchanged; any change bumps RULESET_VERSION):
  - sentence segmentation: regex split ``(?<=[.!?])\\s+``, applied PER TEXT
    SPAN (a sentence crossing a span boundary is never joined); blank
    sentences dropped; sent_idx is a global 0-based counter per document in
    span order.
  - tokenization: regex ``[A-Za-z0-9_']+``; original case kept for surfaces.
  - tagging: lowercase lookup in the frozen lexicons (spec/lexicon.py);
    default tag NOUN.
  - relation: at the leftmost untried V, consume the maximal V+ run, then
    scan right over tokens tagged in {NOUN, ADJ, ADV, DET, PREP}; if a PREP
    is seen, the relation extends to the LAST such PREP (leftmost-longest);
    scanning stops at the first token outside that set.
  - subject: nearest NOUN strictly left of the relation start, extended left
    over NOUN+ then ADJ* then one optional DET.
  - argument: first NOUN strictly right of the relation end, extended left
    over ADJ* then one optional DET (never crossing the relation), extended
    right over NOUN+.
  - scan resumes after the argument (non-overlapping triples); a sentence
    may yield several triples.
  - per-document exact dedup on (subj, rel, arg), first occurrence (lowest
    sent_idx) wins.
  - conf = 1.0 always (v1 has no confidence model).
  - normalization (OP-24): NFC, lowercase, strip ONE leading determiner,
    collapse internal whitespace, strip.
"""

from __future__ import annotations

import re
import unicodedata
from typing import NamedTuple

from openie_spark.spec.lexicon import ADJ_SET, ADV_SET, DET_SET, PREP_SET, VERB_SET

RULESET_VERSION = "v3"

# Copulas for SVC typing: the be-forms present in the frozen VERB lexicon.
# Frozen with the rule set — editing it bumps RULESET_VERSION.
COPULA_SET = frozenset("is was are were be been".split())
assert COPULA_SET <= VERB_SET, "copulas must be taggable as verbs"

# Coordinating conjunctions for the v3 conj/cc arcs + expansion.  These
# words are NOT in any POS lexicon (they tag NOUN by default), so v1/v2 NP
# boundaries are unaffected; v3 recognizes them INSIDE already-found NPs.
CONJ_SET = frozenset("and or".split())

CLAUSE_TYPES = ("SV", "SVC", "SVO", "SVA")

SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
TOKEN_RE = re.compile(r"[A-Za-z0-9_']+")
_WS_RE = re.compile(r"\s+")

# POS tags (single chars so a sentence's tag sequence packs into one str
# and the scan loops run as C-level str.find/rfind — hot-path plumbing,
# NOT a rule change; test_rules_properties pins _TAG_MAP/tag() equality)
NOUN, V, P, D, A, R = "N", "V", "P", "D", "A", "R"
_W_SET = frozenset({NOUN, A, R, D})  # ReVerb's W class: nouns/adj/adv/det


class Triple(NamedTuple):
    sent_idx: int
    subj: str
    rel: str
    arg: str
    subj_norm: str
    arg_norm: str
    conf: float
    clause_type: str
    deps: str  # v3: '|'-joined label(head_idx,dep_idx) arcs
    conj: int  # v3: 0 = base row (the v2 subset), 1 = conjunction-expanded


def segment(text: str) -> list[str]:
    """Split one text span into sentences; blanks dropped, order kept."""
    if not text:
        return []
    return [s for s in SENT_SPLIT_RE.split(text) if s.strip()]


def tokenize(sentence: str) -> list[str]:
    return TOKEN_RE.findall(sentence)


def tag(token: str) -> str:
    t = token.lower()
    if t in VERB_SET:
        return V
    if t in PREP_SET:
        return P
    if t in DET_SET:
        return D
    if t in ADJ_SET:
        return A
    if t in ADV_SET:
        return R
    return NOUN


# Hot-path plumbing (NOT a rule change): one dict lookup replaces the 5
# chained set-membership tests of tag() — NOUN tokens (the majority) pay
# five misses there.  Built in REVERSE precedence so a word in several
# lexica gets the same tag tag() would return (VERB wins, then PREP, DET,
# ADJ, ADV).  test_rules_properties pins map-vs-tag() equality.
_TAG_MAP: dict[str, int] = {}
for _w in ADV_SET:
    _TAG_MAP[_w] = R
for _w in ADJ_SET:
    _TAG_MAP[_w] = A
for _w in DET_SET:
    _TAG_MAP[_w] = D
for _w in PREP_SET:
    _TAG_MAP[_w] = P
for _w in VERB_SET:
    _TAG_MAP[_w] = V
del _w


def _normalize_mention_uncached(surface: str) -> str:
    """OP-24 normative body: NFC, lower, strip one leading determiner,
    collapse whitespace."""
    s = unicodedata.normalize("NFC", surface).lower()
    s = _WS_RE.sub(" ", s).strip()
    parts = s.split(" ", 1)
    if len(parts) == 2 and parts[0] in DET_SET:
        s = parts[1]
    return s


# Hot-path plumbing (same license as the lows/tags precompute in
# extract_sentence — NOT a rule change): normalize_mention is pure and
# mention surfaces repeat Zipf-fashion, so a capped memo turns the NFC +
# regex work into a dict hit for the common case.  ~10% whole-extraction
# win measured on the bench corpus; transparency is pytest-gated
# (test_rules_properties: cached == uncached on adversarial surfaces).
_NORM_CACHE: dict[str, str] = {}
_NORM_CACHE_MAX = 1 << 17  # bounds worker-lifetime memory, ~a few MB


def normalize_mention(surface: str) -> str:
    """OP-24 (memoized; the uncached body above is the definition)."""
    r = _NORM_CACHE.get(surface)
    if r is None:
        r = _normalize_mention_uncached(surface)
        if len(_NORM_CACHE) < _NORM_CACHE_MAX:
            _NORM_CACHE[surface] = r
    return r


def _norm_span(lows: list[str], a: int, b: int) -> str:
    """normalize_mention specialized to an extraction span (hot-path
    plumbing, NOT a rule change): surfaces here are ' '-joins of TOKEN_RE
    matches — pure ASCII (NFC is identity), single-spaced, no edge
    whitespace — so the normative body reduces to joining the pre-lowered
    tokens and dropping one leading determiner when another word follows.
    test_rules_properties pins equality with normalize_mention on every
    emitted span."""
    if b - a > 1 and lows[a] in DET_SET:
        a += 1
    return " ".join(lows[a:b])


def _np_left(tokens: list[str], tags: str, end: int) -> tuple[int, int] | None:
    """Nearest NP (DET? ADJ* NOUN+) whose head NOUN is the nearest NOUN at
    index <= end.  Returns (start, stop) token slice or None.  The NOUN
    search is a C-level str.rfind over the packed tag string; the short
    DET?/ADJ*/NOUN+ extensions stay as loops (NP prefixes are tiny)."""
    h = tags.rfind(NOUN, 0, end + 1)
    if h < 0:
        return None
    s = h
    while s - 1 >= 0 and tags[s - 1] == NOUN:
        s -= 1
    while s - 1 >= 0 and tags[s - 1] == A:
        s -= 1
    if s - 1 >= 0 and tags[s - 1] == D:
        s -= 1
    return (s, h + 1)


def _np_right(
    tokens: list[str], tags: str, start: int
) -> tuple[int, int] | None:
    """First NP (DET? ADJ* NOUN+) whose head NOUN is at index >= start; the
    DET/ADJ prefix may not reach left of ``start``."""
    n = len(tokens)
    h = tags.find(NOUN, start)
    if h < 0:
        return None
    s = h
    while s - 1 >= start and tags[s - 1] == A:
        s -= 1
    if s - 1 >= start and tags[s - 1] == D:
        s -= 1
    e = h
    while e + 1 < n and tags[e + 1] == NOUN:
        e += 1
    return (s, e + 1)


def _conjunct_spans(
    lows: list[str],
    tags: str,
    span: tuple[int, int],
    has_conj: bool = True,
) -> list[tuple[int, int]]:
    """v3: split an NP span at CONJ_SET tokens.  A split is valid only when
    it yields >= 2 segments EACH containing at least one non-conjunction
    NOUN token; otherwise the whole span is returned unsplit.

    ``lows`` are the pre-lowercased sentence tokens and ``has_conj`` the
    precomputed sentence-level CONJ presence — pure hot-path plumbing
    (conjunction-free sentences, the overwhelming majority, take the
    early return), not a rule change."""
    if not has_conj:
        return [span]
    s, e = span
    segs: list[tuple[int, int]] = []
    cur = s
    for j in range(s, e):
        if lows[j] in CONJ_SET:
            segs.append((cur, j))
            cur = j + 1
    segs.append((cur, e))
    if len(segs) < 2:
        return [span]
    for a, b in segs:
        if not any(
            tags[j] == NOUN and lows[j] not in CONJ_SET for j in range(a, b)
        ):
            return [span]
    return segs


def _seg_head(lows: list[str], tags: str, seg: tuple[int, int]) -> int:
    """Head of an NP (segment): its RIGHTMOST non-conjunction NOUN (UD
    compound convention)."""
    for j in range(seg[1] - 1, seg[0] - 1, -1):
        if tags[j] == NOUN and lows[j] not in CONJ_SET:
            return j
    return seg[1] - 1  # unreachable for valid NPs (NOUN+ guaranteed)


def _np_arcs(
    lows: list[str],
    tags: str,
    span: tuple[int, int],
    arcs: list[str],
    has_conj: bool,
) -> None:
    """v3 NP-internal arcs: det/amod/advmod/compound to the segment head;
    cc/conj across coordination segments (conj from the FIRST segment's
    head, UD convention)."""
    if not has_conj:
        # fast path (hot-path plumbing, NOT a rule change): without a
        # conjunction in the sentence there is exactly one segment whose
        # head is the span's rightmost NOUN, and no token is in CONJ_SET —
        # identical arcs to the general path below, minus the segment
        # machinery.  Pinned by the same bit-identity tests.
        s, e = span
        h = e - 1  # rightmost NOUN: both NP builders end spans on the head
        append = arcs.append
        for j in range(s, e):
            if j == h:
                continue
            tj = tags[j]
            if tj == D:
                append(f"det({h},{j})")
            elif tj == A:
                append(f"amod({h},{j})")
            elif tj == R:
                append(f"advmod({h},{j})")
            else:
                append(f"compound({h},{j})")
        return
    segs = _conjunct_spans(lows, tags, span, has_conj)
    first_head = _seg_head(lows, tags, segs[0])
    for k, seg in enumerate(segs):
        h = first_head if k == 0 else _seg_head(lows, tags, seg)
        if k > 0:
            arcs.append(f"cc({h},{seg[0] - 1})")  # the conj token before seg
            arcs.append(f"conj({first_head},{h})")
        for j in range(seg[0], seg[1]):
            if j == h or lows[j] in CONJ_SET:
                continue
            tj = tags[j]
            if tj == D:
                arcs.append(f"det({h},{j})")
            elif tj == A:
                arcs.append(f"amod({h},{j})")
            elif tj == R:
                arcs.append(f"advmod({h},{j})")
            else:
                arcs.append(f"compound({h},{j})")


def _clause_arcs(
    lows: list[str],
    tags: str,
    i: int,
    v_end: int,
    rel_end: int,
    last_p: int,
    subj_span: tuple[int, int],
    arg_span: tuple[int, int] | None,
    has_conj: bool,
) -> tuple[list[str], str]:
    """v3: assemble the clause's dependency arcs and the clause type.  The
    type IS the arc pattern (obl→SVA, cop→SVC, obj→SVO, else SV) — it is
    returned alongside the arcs because this function already knows which
    branch fired; _type_from_arcs stays the normative derivation and the
    property/v3 tests assert the two agree on every emitted row."""
    arcs: list[str] = []
    clause_type = "SV"
    subj_head = subj_span[1] - 1  # rightmost noun of the subject NP
    all_cop = all(lows[j] in COPULA_SET for j in range(i, v_end + 1))
    if arg_span is not None:
        arg_head = arg_span[1] - 1
        if last_p >= 0:  # prepositional argument → oblique
            arcs.append(f"nsubj({v_end},{subj_head})")
            arcs.append(f"obl({v_end},{arg_head})")
            arcs.append(f"case({arg_head},{last_p})")
            clause_type = "SVA"
        elif all_cop:  # copular clause: complement is the head (UD cop)
            arcs.append(f"nsubj({arg_head},{subj_head})")
            for j in range(i, v_end + 1):
                arcs.append(f"cop({arg_head},{j})")
            clause_type = "SVC"
        else:
            arcs.append(f"nsubj({v_end},{subj_head})")
            arcs.append(f"obj({v_end},{arg_head})")
            clause_type = "SVO"
    else:
        arcs.append(f"nsubj({v_end},{subj_head})")
        if last_p >= 0:  # trailing preposition, no argument to attach
            arcs.append(f"mark({v_end},{last_p})")
    # V+ run internals: head = last verb, earlier verbs are auxiliaries
    # (skipped for pure-copula argful clauses — those carry cop arcs)
    if not (arg_span is not None and last_p < 0 and all_cop):
        for j in range(i, v_end):
            arcs.append(f"aux({v_end},{j})")
    # relation-interior tokens (W* zone, excluding the case/mark PREP)
    for j in range(v_end + 1, rel_end + 1):
        if j == last_p:
            continue
        tj = tags[j]
        if tj == R:
            arcs.append(f"advmod({v_end},{j})")
        elif tj == A:
            arcs.append(f"amod({v_end},{j})")
        elif tj == D:
            arcs.append(f"det({v_end},{j})")
        elif tj == P:
            arcs.append(f"case({v_end},{j})")
        else:
            arcs.append(f"compound({v_end},{j})")
    # NP internals
    _np_arcs(lows, tags, subj_span, arcs, has_conj)
    if arg_span is not None:
        _np_arcs(lows, tags, arg_span, arcs, has_conj)
    return arcs, clause_type


# Hot-path plumbing (same license as _NORM_CACHE — NOT a rule change):
# for a conjunction-free sentence the assembled arc list and clause type
# depend ONLY on the tag pattern, the clause positions, and whether the
# V+ run is all-copula (the sole word-sensitive input) — never on the
# words themselves.  Tag patterns repeat Zipf-fashion across a corpus, so
# a capped memo turns the whole f-string assembly into one dict hit.
# Bit-identity with the uncached path is pinned by the same golden/v2/v3
# tests that froze the rule set.
_ARC_CACHE: dict[tuple, tuple[str, str]] = {}
_ARC_CACHE_MAX = 1 << 16


def _clause_deps(
    lows: list[str],
    tags: str,
    i: int,
    v_end: int,
    rel_end: int,
    last_p: int,
    subj_span: tuple[int, int],
    arg_span: tuple[int, int] | None,
    has_conj: bool,
) -> tuple[str, str]:
    """Memoizing front-end of _clause_arcs: returns ('|'-joined deps,
    clause_type).  Conjunction-bearing sentences bypass the memo (their
    arcs depend on CONJ token positions in ``lows``)."""
    if has_conj:
        arcs, ct = _clause_arcs(
            lows, tags, i, v_end, rel_end, last_p, subj_span, arg_span, True
        )
        return "|".join(arcs), ct
    all_cop = all(lows[j] in COPULA_SET for j in range(i, v_end + 1))
    key = (tags, i, v_end, rel_end, last_p, subj_span, arg_span, all_cop)
    hit = _ARC_CACHE.get(key)
    if hit is None:
        arcs, ct = _clause_arcs(
            lows, tags, i, v_end, rel_end, last_p, subj_span, arg_span, False
        )
        hit = ("|".join(arcs), ct)
        if len(_ARC_CACHE) < _ARC_CACHE_MAX:
            _ARC_CACHE[key] = hit
    return hit


def _type_from_arcs(arcs: list[str]) -> str:
    """v3 dependency-pattern clause typing: the arc labels ARE the type."""
    labels = {a.split("(", 1)[0] for a in arcs}
    if "obl" in labels:
        return "SVA"
    if "cop" in labels:
        return "SVC"
    if "obj" in labels:
        return "SVO"
    return "SV"


def extract_sentence(sentence: str, sent_idx: int) -> list[Triple]:
    """Apply the frozen relation/NP rules to one sentence.  v3: clause
    arcs are assembled first and clause_type is derived from the arc
    pattern; conjunction expansions follow their base row (subject-major,
    argument-minor order), tagged conj=1."""
    tokens = tokenize(sentence)
    if not tokens:
        return []
    # hot path: lowercase once, tag from the lowered forms (identical to
    # per-token tag()), and precompute sentence-level CONJ presence so
    # conjunction-free sentences skip all v3 splitting machinery
    lows = list(map(str.lower, tokens))
    _tg = _TAG_MAP.get
    # tag sequence packed into ONE str: the verb-run / zone / NP-head scans
    # below run as C-level str.find/rfind instead of per-token Python steps
    # (hot-path plumbing, NOT a rule change — same tags, same boundaries)
    tags = "".join([_tg(t, NOUN) for t in lows])
    has_conj = not CONJ_SET.isdisjoint(lows)
    n = len(tokens)
    out: list[Triple] = []
    i = 0
    while True:
        i = tags.find(V, i)  # leftmost untried verb
        if i < 0:
            break
        # maximal V+ run
        v_end = i
        while v_end + 1 < n and tags[v_end + 1] == V:
            v_end += 1
        # leftmost-longest extension: W* ending at the LAST reachable PREP;
        # _W_SET ∪ {P} is every tag except V, so the zone ends at the next V
        nxt_v = tags.find(V, v_end + 1)
        last_p = tags.rfind(P, v_end + 1, nxt_v if nxt_v >= 0 else n)
        rel_end = last_p if last_p >= 0 else v_end
        subj_span = _np_left(tokens, tags, i - 1)
        arg_span = _np_right(tokens, tags, rel_end + 1)
        if subj_span is None:
            i = v_end + 1
            continue
        subj = " ".join(tokens[subj_span[0] : subj_span[1]])
        rel = " ".join(tokens[i : rel_end + 1])
        deps, clause_type = _clause_deps(
            lows, tags, i, v_end, rel_end, last_p, subj_span, arg_span, has_conj
        )
        subj_segs = _conjunct_spans(lows, tags, subj_span, has_conj)
        if arg_span is None:
            # SV emission (v2): intransitive clause.  Resume point is
            # v_end + 1 — exactly where v1 resumed from its no-emit path.
            out.append(
                Triple(
                    sent_idx, subj, rel, "",
                    _norm_span(lows, subj_span[0], subj_span[1]), "",
                    1.0, clause_type, deps, 0,
                )
            )
            if len(subj_segs) > 1:
                for ss in subj_segs:
                    s_sur = " ".join(tokens[ss[0] : ss[1]])
                    out.append(
                        Triple(
                            sent_idx, s_sur, rel, "",
                            _norm_span(lows, ss[0], ss[1]), "",
                            1.0, clause_type, deps, 1,
                        )
                    )
            i = v_end + 1
            continue
        arg = " ".join(tokens[arg_span[0] : arg_span[1]])
        out.append(
            Triple(
                sent_idx,
                subj,
                rel,
                arg,
                _norm_span(lows, subj_span[0], subj_span[1]),
                _norm_span(lows, arg_span[0], arg_span[1]),
                1.0,
                clause_type,
                deps,
                0,
            )
        )
        arg_segs = _conjunct_spans(lows, tags, arg_span, has_conj)
        if len(subj_segs) > 1 or len(arg_segs) > 1:
            for ss in subj_segs:
                for asg in arg_segs:
                    s_sur = " ".join(tokens[ss[0] : ss[1]])
                    a_sur = " ".join(tokens[asg[0] : asg[1]])
                    if s_sur == subj and a_sur == arg:
                        continue  # the base combination is already emitted
                    out.append(
                        Triple(
                            sent_idx, s_sur, rel, a_sur,
                            _norm_span(lows, ss[0], ss[1]),
                            _norm_span(lows, asg[0], asg[1]),
                            1.0, clause_type, deps, 1,
                        )
                    )
        i = arg_span[1]  # non-overlapping: resume after the argument
    return out


def extract_pairs(pairs) -> list[Triple]:
    """Apply rule set v1 to one document given as an iterable of
    (kind, text) span pairs — the shared kernel for both the dict-shaped
    oracle path and the Arrow columnar path (same frozen rules; this is an
    internal refactor, not a rule change).

    Only kind='text' spans feed extraction; media spans are skipped but do
    not reset the sentence counter (sent_idx is global per doc).  Per-doc
    exact dedup on (subj, rel, arg), first occurrence wins.  v3: expanded
    (conj=1) rows dedup against everything emitted earlier (base or
    expanded), but BASE dedup never consults expanded keys — the conj=0
    subset is therefore byte-identical to the v2 output.
    """
    triples: list[Triple] = []
    seen: set[tuple[str, str, str]] = set()
    seen_conj: set[tuple[str, str, str]] = set()
    sent_idx = 0
    for kind, text in pairs:
        if kind != "text" or text is None:
            continue
        for sent in segment(text):
            # NOTE: per-sentence memoization was tried and REVERTED — the
            # realistic corpora here have only ~18% duplicate sentences, so
            # an LRU cache churns (14% hit rate) and costs 1.5x the plain
            # scan.  Re-introduce only behind a measured-dup-ratio guard.
            for t in extract_sentence(sent, sent_idx):
                key = (t.subj, t.rel, t.arg)
                if t.conj:
                    if key not in seen and key not in seen_conj:
                        seen_conj.add(key)
                        triples.append(t)
                elif key not in seen:
                    seen.add(key)
                    triples.append(t)
            sent_idx += 1
    return triples


def extract_document(spans: list[dict]) -> list[Triple]:
    """Apply rule set v1 to one document's span array (the input_hint shape)."""
    return extract_pairs((s.get("kind"), s.get("text")) for s in spans)
