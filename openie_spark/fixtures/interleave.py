"""Shared interleaving rule (FIXTURES.md §2): turn flat text into the
input_hint span shape, inserting media spans between text chunks.

Rule (deterministic in the integer doc key `k`):
  - split text into n_chunks = 1 + (k mod 4) consecutive word-boundary chunks
  - text spans carry cumulative char `offset`
  - between chunk j and j+1, insert a media span when (k + j) mod 3 == 0:
    kind = ('image', 'audio', 'video')[k mod 3], text = NULL,
    media_ref = f"media://{doc_id}/{j}", offset = current char offset

(The kind cycle was image/audio by k mod 2 until late r4; the 3-way cycle
drives the real y4m video codec through the e2e media path.  Span counts,
offsets and all text spans are unchanged by that revision — only `kind`
values moved — so extraction goldens and span pins are unaffected; the
media twin fixtures regenerate.)
"""

from __future__ import annotations


def _chunk_words(text: str, n_chunks: int) -> list[str]:
    words = text.split(" ")
    if n_chunks <= 1 or len(words) <= 1:
        return [text]
    per = max(1, len(words) // n_chunks)
    chunks = []
    for c in range(n_chunks):
        lo = c * per
        hi = len(words) if c == n_chunks - 1 else (c + 1) * per
        if lo >= len(words):
            break
        chunks.append(" ".join(words[lo:hi]))
    return chunks


def interleave_spans(k: int, doc_id: str, text: str) -> list[dict]:
    n_chunks = 1 + (k % 4)
    chunks = _chunk_words(text, n_chunks)
    media_kind = ("image", "audio", "video")[k % 3]
    spans: list[dict] = []
    offset = 0
    for j, chunk in enumerate(chunks):
        spans.append({"kind": "text", "text": chunk, "media_ref": None, "offset": offset})
        offset += len(chunk) + 1
        if j < len(chunks) - 1 and (k + j) % 3 == 0:
            spans.append(
                {
                    "kind": media_kind,
                    "text": None,
                    "media_ref": f"media://{doc_id}/{j}",
                    "offset": offset,
                }
            )
    return spans
