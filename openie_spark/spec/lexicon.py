"""Frozen closed-class lexicons for rule set v1 (SURVEY.md §2.3, OP-22).

These word lists ARE the POS model: a token is tagged by lowercase lookup in
these sets; anything unknown is NOUN.  The lists are normative — changing any
entry bumps RULESET_VERSION and regenerates every golden file.  LEXICON_SHA256
is stamped into checkpoint rows and golden manifests so a silent edit is
detectable.
"""

from __future__ import annotations

import hashlib
import json

DET = (
    "the a an this that these those its their his her our your my some any each every"
).split()

PREP = (
    "in on at with by for from to of into over under near against through during "
    "between across behind beyond within along around after before"
).split()

VERB = (
    "is was are were be been has have had founded acquired built created owns owned "
    "leads led makes made sells sold runs ran joined launched developed produces "
    "employs manages supports supplies operates announced released invented designed "
    "bought hired opened moved works worked lives lived merged partnered invested "
    "signed won lost became serves provides backs funds advises licenses ships "
    "maintains distributes powers hosts trains publishes"
).split()

ADJ = (
    "big small fast slow new old red blue green large tiny global local modern "
    "ancient famous quiet major minor key early late private public digital rural "
    "urban senior junior"
).split()

ADV = (
    "quickly slowly quietly recently often never always soon already finally "
    "eventually initially later together openly"
).split()

DET_SET = frozenset(DET)
PREP_SET = frozenset(PREP)
VERB_SET = frozenset(VERB)
ADJ_SET = frozenset(ADJ)
ADV_SET = frozenset(ADV)

_overlap = (
    (DET_SET & PREP_SET)
    | (DET_SET & VERB_SET)
    | (DET_SET & ADJ_SET)
    | (DET_SET & ADV_SET)
    | (PREP_SET & VERB_SET)
    | (PREP_SET & ADJ_SET)
    | (PREP_SET & ADV_SET)
    | (VERB_SET & ADJ_SET)
    | (VERB_SET & ADV_SET)
    | (ADJ_SET & ADV_SET)
)
assert not _overlap, f"lexicon classes must be disjoint, overlap: {_overlap}"

LEXICON_SHA256 = hashlib.sha256(
    json.dumps(
        {"det": DET, "prep": PREP, "verb": VERB, "adj": ADJ, "adv": ADV},
        sort_keys=True,
    ).encode()
).hexdigest()
