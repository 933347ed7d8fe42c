"""The vectorized SimHash batch kernel must be bit-identical to the scalar
(oracle-reference) path — including the empty-doc sentinel (0) and
token-set dedup.  Same discipline as tests/unit/test_minhash_batch.py."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from openie_spark.operators.dedup import _simhash, _simhash_batch


def _scalar(text: str | None) -> tuple[int, int]:
    return _simhash((text or "").lower().split())


def _pair(row) -> tuple[int, int]:
    return (int(row[0]), int(row[1]))


def test_batch_matches_scalar_fixed():
    texts = [
        "the quick brown fox",
        "the quick brown fox",  # duplicate doc → identical signature
        "THE QUICK BROWN FOX",  # case folding
        "completely different content entirely",
        "",  # empty → 0 sentinel
        None,  # null → 0 sentinel
        "tiny",
        "a a a a a",  # token-set dedup: same as just "a"
        "a",
        "ünïcode naïve tokens",
    ]
    got = _simhash_batch(texts)
    for i, t in enumerate(texts):
        assert _pair(got[i]) == _scalar(t), t
    assert _pair(got[7]) == _pair(got[8])  # set semantics
    assert _pair(got[4]) == (0, 0) and _pair(got[5]) == (0, 0)


def test_batch_tiny_blocks_and_giant_doc_fallback():
    """The posting-block chunking and the ≥256-unique-token byte-lane
    fallback must both stay bit-identical to the scalar path."""
    texts = [f"doc {i} shares some tokens token_{i % 7}" for i in range(50)]
    got = _simhash_batch(texts, block_tokens=16)  # force many blocks
    for i, t in enumerate(texts):
        assert _pair(got[i]) == _scalar(t)

    giant = " ".join(f"tok{i}" for i in range(400))  # > 255 unique tokens
    mix = [giant, "small doc here", giant + " extra", "", None]
    got = _simhash_batch(mix)
    for i, t in enumerate(mix):
        assert _pair(got[i]) == _scalar(t)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=24), min_size=0, max_size=10))
def test_batch_property(texts):
    got = _simhash_batch(texts)
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        assert _pair(got[i]) == _scalar(t)
