"""Golden grammar corpus generator (FIXTURES.md §3) — the extraction-quality
fixture.  The driver `documents` text is bag-of-words without verbs, so P/R
testing needs this separately synthesized corpus: 800 docs, 1-6 sentences,
seed 42, grammar

    template  := NP ' ' V_PHRASE ' ' NP ('.'|'!'|'?')
    NP        := (DET ' ')? (ADJ ' ')* PROPER | COMMON
    V_PHRASE  := V | V ' ' PREP | V ' ' NOUN ' ' PREP   # all 3 ReVerb branches

Entities drawn zipf(alpha=1.2) from the 200-entity universe (hot-key skew is
intentional).  Edge cases are injected at fixed doc indices (see EDGE_DOCS):
sentence split across two consecutive text spans, media-only doc, empty text
span, no-verb sentence, two triples in one sentence, duplicate triple in one
doc, mixed-case + apostrophe tokens, zh-tagged row with ASCII words.
"""

from __future__ import annotations

import numpy as np

from openie_spark.fixtures.entities import COMMON_NOUNS, entity_names, zipf_probs
from openie_spark.fixtures.interleave import interleave_spans
from openie_spark.spec.lexicon import ADJ, DET, PREP, VERB

SEED = 42
N_DOCS = 800

# Fixed indices where hand-built edge-case docs replace generated ones.
EDGE_DOCS = {
    790: "span_boundary_sentence",
    791: "media_only",
    792: "empty_text_span",
    793: "no_verb_sentence",
    794: "two_triples_one_sentence",
    795: "duplicate_triple",
    796: "mixed_case_apostrophe",
    797: "zh_tagged_ascii",
}


def _np_phrase(rng: np.random.Generator, entities: list[str], probs) -> str:
    if rng.random() < 0.7:
        core = entities[int(rng.choice(len(entities), p=probs))]
    else:
        core = COMMON_NOUNS[int(rng.integers(len(COMMON_NOUNS)))]
    parts = []
    if rng.random() < 0.5:
        parts.append(DET[int(rng.integers(len(DET)))])
    n_adj = int(rng.integers(0, 3))
    for _ in range(n_adj):
        parts.append(ADJ[int(rng.integers(len(ADJ)))])
    parts.append(core)
    return " ".join(parts)


def _v_phrase(rng: np.random.Generator) -> str:
    v = VERB[int(rng.integers(len(VERB)))]
    branch = int(rng.integers(3))
    if branch == 0:
        return v
    if branch == 1:
        return f"{v} {PREP[int(rng.integers(len(PREP)))]}"
    noun = COMMON_NOUNS[int(rng.integers(len(COMMON_NOUNS)))]
    return f"{v} {noun} {PREP[int(rng.integers(len(PREP)))]}"


def _sentence(rng: np.random.Generator, entities, probs) -> str:
    end = ".!?"[int(rng.integers(3))]
    return (
        f"{_np_phrase(rng, entities, probs)} {_v_phrase(rng)} "
        f"{_np_phrase(rng, entities, probs)}{end}"
    )


def _edge_case_doc(kind: str, doc_id: str) -> dict:
    if kind == "span_boundary_sentence":
        # one sentence's text torn across two consecutive text spans — per-span
        # segmentation must NOT join them (each half parses independently).
        spans = [
            {"kind": "text", "text": "acme corp acquired the", "media_ref": None, "offset": 0},
            {"kind": "text", "text": "small startup. orion labs owns a factory.", "media_ref": None, "offset": 22},
        ]
    elif kind == "media_only":
        spans = [
            {"kind": "image", "text": None, "media_ref": f"media://{doc_id}/0", "offset": 0},
            {"kind": "audio", "text": None, "media_ref": f"media://{doc_id}/1", "offset": 0},
        ]
    elif kind == "empty_text_span":
        spans = [
            {"kind": "text", "text": "", "media_ref": None, "offset": 0},
            {"kind": "text", "text": "zenith systems built a bridge.", "media_ref": None, "offset": 0},
        ]
    elif kind == "no_verb_sentence":
        spans = [
            {"kind": "text", "text": "the big red mountain. nova group launched a product.", "media_ref": None, "offset": 0},
        ]
    elif kind == "two_triples_one_sentence":
        spans = [
            {"kind": "text", "text": "alice founded acmeco and bobtech joined quartz labs.", "media_ref": None, "offset": 0},
        ]
    elif kind == "duplicate_triple":
        spans = [
            {"kind": "text", "text": "vertex group owns a factory. vertex group owns a factory!", "media_ref": None, "offset": 0},
        ]
    elif kind == "mixed_case_apostrophe":
        spans = [
            {"kind": "text", "text": "Acme Corp's team launched O'Brien network.", "media_ref": None, "offset": 0},
        ]
    elif kind == "zh_tagged_ascii":
        spans = [
            {"kind": "text", "text": "delta works hired an engineer.", "media_ref": None, "offset": 0},
            {"kind": "image", "text": None, "media_ref": f"media://{doc_id}/1", "offset": 30},
        ]
    else:  # pragma: no cover
        raise ValueError(kind)
    return {"doc_id": doc_id, "spans": spans}


def golden_docs(n_docs: int = N_DOCS, seed: int = SEED) -> list[dict]:
    """The frozen golden corpus in the input_hint shape."""
    rng = np.random.default_rng(seed)
    entities = entity_names()
    probs = zipf_probs(len(entities))
    docs: list[dict] = []
    for i in range(n_docs):
        doc_id = f"g{i:05d}"
        if i in EDGE_DOCS:
            docs.append(_edge_case_doc(EDGE_DOCS[i], doc_id))
            continue
        n_sent = int(rng.integers(1, 7))
        text = " ".join(_sentence(rng, entities, probs) for _ in range(n_sent))
        docs.append({"doc_id": doc_id, "spans": interleave_spans(i, doc_id, text)})
    return docs
