"""Rule set v2 — the frozen executable specification of triple extraction.

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

RULESET_VERSION = "v2"

# Copulas for SVC typing: the be-forms present in the frozen VERB lexicon.
# Frozen with the rule set — editing it bumps RULESET_VERSION.
COPULA_SET = frozenset("is was are were be been".split())
assert COPULA_SET <= VERB_SET, "copulas must be taggable as verbs"

CLAUSE_TYPES = ("SV", "SVC", "SVO", "SVA")

SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
TOKEN_RE = re.compile(r"[A-Za-z0-9_']+")
_WS_RE = re.compile(r"\s+")

# POS tags (ints for speed inside the vectorized path)
NOUN, V, P, D, A, R = 0, 1, 2, 3, 4, 5
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


def segment(text: str) -> list[str]:
    """Split one text span into sentences; blanks dropped, order kept."""
    if not text:
        return []
    return [s for s in SENT_SPLIT_RE.split(text) if s.strip()]


def tokenize(sentence: str) -> list[str]:
    return TOKEN_RE.findall(sentence)


def tag(token: str) -> int:
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


def normalize_mention(surface: str) -> str:
    """OP-24: NFC, lower, strip one leading determiner, collapse whitespace."""
    s = unicodedata.normalize("NFC", surface).lower()
    s = _WS_RE.sub(" ", s).strip()
    parts = s.split(" ", 1)
    if len(parts) == 2 and parts[0] in DET_SET:
        s = parts[1]
    return s


def _np_left(tokens: list[str], tags: list[int], end: int) -> tuple[int, int] | None:
    """Nearest NP (DET? ADJ* NOUN+) whose head NOUN is the nearest NOUN at
    index <= end.  Returns (start, stop) token slice or None."""
    h = end
    while h >= 0 and tags[h] != NOUN:
        h -= 1
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
    tokens: list[str], tags: list[int], start: int
) -> tuple[int, int] | None:
    """First NP (DET? ADJ* NOUN+) whose head NOUN is at index >= start; the
    DET/ADJ prefix may not reach left of ``start``."""
    n = len(tokens)
    h = start
    while h < n and tags[h] != NOUN:
        h += 1
    if h >= n:
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


def extract_sentence(sentence: str, sent_idx: int) -> list[Triple]:
    """Apply the v1 relation/NP rules to one sentence."""
    tokens = tokenize(sentence)
    if not tokens:
        return []
    tags = [tag(t) for t in tokens]
    n = len(tokens)
    out: list[Triple] = []
    i = 0
    while i < n:
        if tags[i] != V:
            i += 1
            continue
        # maximal V+ run
        v_end = i
        while v_end + 1 < n and tags[v_end + 1] == V:
            v_end += 1
        # leftmost-longest extension: W* ending at the LAST reachable PREP
        rel_end = v_end
        j = v_end + 1
        last_p = -1
        while j < n and (tags[j] in _W_SET or tags[j] == P):
            if tags[j] == P:
                last_p = j
            j += 1
        if last_p >= 0:
            rel_end = last_p
        subj_span = _np_left(tokens, tags, i - 1)
        arg_span = _np_right(tokens, tags, rel_end + 1)
        if subj_span is None:
            i = v_end + 1
            continue
        subj = " ".join(tokens[subj_span[0] : subj_span[1]])
        rel = " ".join(tokens[i : rel_end + 1])
        if arg_span is None:
            # v2 SV emission: intransitive clause (subject + verb, no
            # argument NP).  Resume point is v_end + 1 — exactly where v1
            # resumed from its no-emit path, so every v1 triple survives.
            out.append(
                Triple(
                    sent_idx, subj, rel, "", normalize_mention(subj), "", 1.0, "SV"
                )
            )
            i = v_end + 1
            continue
        arg = " ".join(tokens[arg_span[0] : arg_span[1]])
        if last_p >= 0:
            clause_type = "SVA"
        elif all(tokens[j].lower() in COPULA_SET for j in range(i, v_end + 1)):
            clause_type = "SVC"
        else:
            clause_type = "SVO"
        out.append(
            Triple(
                sent_idx,
                subj,
                rel,
                arg,
                normalize_mention(subj),
                normalize_mention(arg),
                1.0,
                clause_type,
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
    exact dedup on (subj, rel, arg), first occurrence wins.
    """
    triples: list[Triple] = []
    seen: set[tuple[str, str, str]] = set()
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
                if key not in seen:
                    seen.add(key)
                    triples.append(t)
            sent_idx += 1
    return triples


def extract_document(spans: list[dict]) -> list[Triple]:
    """Apply rule set v1 to one document's span array (the input_hint shape)."""
    return extract_pairs((s.get("kind"), s.get("text")) for s in spans)
