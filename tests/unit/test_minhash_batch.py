"""The vectorized MinHash batch path must be bit-identical to the scalar
(oracle-reference) path — signatures, band keys, and empty handling."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openie_spark.functions import minhash as mh


def test_mulmod_exact_random():
    rng = np.random.default_rng(3)
    a_vals = [int(x) for x in rng.integers(1, mh.P, 20)]
    x = rng.integers(0, mh.P, 1000).astype(np.uint64)
    for a in a_vals:
        got = mh._mulmod_p(a, x)
        expect = np.array([(a * int(v)) % mh.P for v in x], dtype=np.uint64)
        assert np.array_equal(got, expect)


def test_mulmod_edges():
    edges = np.array([0, 1, 2, mh.P - 1, mh.P - 2, (1 << 32) - 1, 1 << 32],
                     dtype=np.uint64)
    for a in (1, 2, mh.P - 1, (1 << 32) + 1, 0x9E3779B97F4A7C15 % mh.P):
        got = mh._mulmod_p(a, edges)
        expect = np.array([(a * int(v)) % mh.P for v in edges], dtype=np.uint64)
        assert np.array_equal(got, expect)


def test_signatures_batch_matches_scalar():
    strings = ["acme corp", "acme corporation", "x", "", "delta works",
               "the same", "the same", "ünïcode naïve"]
    lists = [mh.shingles(s) for s in strings]
    batch = mh.signatures_batch(lists)
    for i, lst in enumerate(lists):
        assert np.array_equal(batch[i], mh.signature(lst)), strings[i]


def test_band_keys_for_batch_matches_scalar():
    strings = ["acme corp", "", "ab", "abc", "vertex group holdings", None]
    got = mh.band_keys_for_batch(strings)
    for s, keys in zip(strings, got):
        expect = mh.band_keys_for(s) if s else []
        assert keys == expect


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=8))
def test_batch_property(strs):
    got = mh.band_keys_for_batch(strs)
    for s, keys in zip(strs, got):
        assert keys == (mh.band_keys_for(s) if s else [])
