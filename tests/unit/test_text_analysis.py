"""L1 unit tests for text analysis (operators/text_analysis.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openie_spark.operators.text_analysis import (
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog is with us"),          # en markers x5
        (2, "le chat est avec la maison et les arbres"), # fr markers
        (3, "der hund ist und das haus mit garten"),     # de markers
        (4, "zzz qqq www"),                              # no markers → und
        (5, ""),                                         # empty text
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in with_lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "und"
    assert got[5] == "und"


def test_token_counts(spark, docs):
    got = {r["doc_id"]: r for r in with_token_counts(docs).collect()}
    assert got[1]["n_ws_tokens"] == 8
    # bpe-ish tokens on punctuation-free text equal word count
    assert got[1]["n_bpe_tokens"] == 8


def test_bpe_ish_splits_punct(spark):
    df = spark.createDataFrame([(1, "it's 2026, ok!")], "doc_id bigint, text string")
    r = with_token_counts(df).collect()[0]
    # it ' s 2026 , ok !  → 7 bpe-ish tokens, 3 whitespace tokens
    assert r["n_ws_tokens"] == 3
    assert r["n_bpe_tokens"] == 7


def test_quality_features_exact(spark):
    text = "The cat, the dog!"  # 17 chars, 4 words, 2 punct, 2 'the', 1 upper
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = with_quality(df).collect()[0]
    assert r["q_n_chars"] == 17
    assert r["q_n_words"] == 4
    assert r["q_mean_word_len"] == pytest.approx(round(17 / 4, 4))
    assert r["q_punct_ratio"] == pytest.approx(round(2 / 17, 4))
    assert r["q_stopword_ratio"] == pytest.approx(round(2 / 4, 4))
    assert r["q_upper_ratio"] == pytest.approx(round(1 / 17, 4))


def test_quality_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    r = with_quality(df).collect()[0]
    assert r["q_n_chars"] == 0
    assert r["q_punct_ratio"] == 0.0


def test_fingerprint_dup_detection(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, a), (2, a), (3, "prefix words here now then " + a)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in with_fingerprint(df).collect()}
    # identical content → identical fingerprints (both kinds)
    assert got[1]["fp_md5"] == got[2]["fp_md5"]
    assert got[1]["fp_rolling_min"] == got[2]["fp_rolling_min"]
    # prefix edit breaks md5 but the rolling min only moves down (superset
    # of 5-grams) — the shift-invariance property winnowing relies on
    assert got[3]["fp_md5"] != got[1]["fp_md5"]
    assert got[3]["fp_rolling_min"] <= got[1]["fp_rolling_min"]


def test_all_jvm_side(spark, docs):
    """No Python UDF may appear anywhere in these plans (100 TB hot path)."""
    for fn in (with_lang_id, with_quality, with_token_counts, with_fingerprint):
        plan = fn(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_chunk_documents_windows(spark):
    from openie_spark.operators.text_analysis import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks → 2 chunks @ (6,2)
        (2, "a b c"),                               # shorter than a chunk
        (3, ""),                                    # empty → no chunks
        (4, "x " * 6),                              # exactly one chunk
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    ch = chunk_documents(df, "doc_id", "text", chunk_tokens=6, overlap=2)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in ch.collect()
    }
    # doc 1: stride 4 → windows [0:6] and [4:10]
    assert got[(1, 0)] == (6, "t0 t1 t2 t3 t4 t5")
    assert got[(1, 1)] == (6, "t4 t5 t6 t7 t8 t9")
    assert got[(2, 0)] == (3, "a b c")
    assert got[(4, 0)] == (6, "x x x x x x")
    assert not any(k[0] == 3 for k in got)  # empty doc emits nothing
    assert len(got) == 4
    # reconstruction property: dropping each chunk's overlap prefix (after
    # chunk 0) re-concatenates to the original token stream
    toks = []
    for idx in range(2):
        words = got[(1, idx)][1].split()
        toks.extend(words if idx == 0 else words[2:])
    assert toks == [f"t{i}" for i in range(10)]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from openie_spark.operators.text_analysis import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_frequent_ngrams_doc_frequency_not_term_frequency(spark):
    from openie_spark.operators.text_analysis import frequent_ngrams

    rows = [
        (1, "a b a b a b"),   # "a b" x3 inside ONE doc → df contribution 1
        (2, "a b c"),         # "a b", "b c"
        (3, "b c d"),         # "b c", "c d"
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.gram: r.df for r in frequent_ngrams(df, n=2, top=10).collect()}
    assert got == {"a b": 2, "b a": 1, "b c": 2, "c d": 1}


def test_frequent_ngrams_total_order_cutoff(spark):
    from openie_spark.operators.text_analysis import frequent_ngrams

    rows = [(i, "x y") for i in range(3)] + [(10, "p q"), (11, "m n")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = [r.gram for r in frequent_ngrams(df, n=2, top=2).collect()]
    # "x y" df=3 first; then the df=1 tie breaks on gram asc → "m n"
    assert out == ["x y", "m n"]


# --- co-occurrence lift (cooccurrence_lift) -----------------------------


def _cooc(spark, rows, **kw):
    from openie_spark.operators.text_analysis import cooccurrence_lift

    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {
        (r["a"], r["b"]): (r["n_ab"], r["lift_micro"])
        for r in cooccurrence_lift(df, **kw).collect()
    }


def test_cooc_perfect_association(spark):
    # x and y always together in 2 of 4 docs: lift = (2*4)/(2*2) = 2.0
    rows = [("d1", "x y"), ("d2", "x y"), ("d3", "z w"), ("d4", "z w")]
    got = _cooc(spark, rows, min_df=2, max_df=10, min_pair_df=2)
    assert got[("x", "y")] == (2, 2_000_000)
    assert got[("w", "z")] == (2, 2_000_000)
    assert ("x", "z") not in got  # never co-occur


def test_cooc_independent_tokens_lift_near_one(spark):
    # p appears in all 4 docs, q in 2: lift(p,q) = (2*4)/(4*2) = 1.0
    rows = [("d1", "p q"), ("d2", "p q"), ("d3", "p r"), ("d4", "p r")]
    got = _cooc(spark, rows, min_df=2, max_df=10, min_pair_df=2)
    assert got[("p", "q")] == (2, 1_000_000)


def test_cooc_df_band_excludes_rare_and_common(spark):
    rows = [("d%d" % i, "common filler%d rare" % i) for i in range(6)]
    # 'common' df=6 > max_df=5; each 'filler_i' df=1 < min_df=2;
    # 'rare' df=6 also excluded -> no pairs at all
    got = _cooc(spark, rows, min_df=2, max_df=5, min_pair_df=1)
    assert got == {}


def test_cooc_per_doc_cap_bounds_fanout(spark):
    # one pathological doc with 30 band-eligible tokens, cap=5:
    # at most C(5,2)=10 pairs can originate from it
    toks = " ".join(f"t{i:02d}" for i in range(30))
    rows = [("big", toks), ("b2", toks)]  # df=2 for every token
    got = _cooc(spark, rows, min_df=2, max_df=10, per_doc_cap=5, min_pair_df=1)
    assert len(got) == 10
    # deterministic rarest-K: ties on df broken by token asc -> t00..t04 kept
    assert set(got) == {
        (f"t{i:02d}", f"t{j:02d}") for i in range(5) for j in range(i + 1, 5)
    }


def test_cooc_deterministic_across_parallelism(spark):
    from openie_spark.operators.text_analysis import cooccurrence_lift

    rows = [
        ("d%d" % i, " ".join(f"w{(i * k) % 7}" for k in range(1, 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(
        map(tuple, cooccurrence_lift(df.repartition(1), min_df=2, max_df=20).collect())
    )
    b = sorted(
        map(tuple, cooccurrence_lift(df.repartition(8), min_df=2, max_df=20).collect())
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# ranked retrieval (ranked_retrieval)
# ---------------------------------------------------------------------------


def test_ranked_retrieval_hand_computed(spark):
    from openie_spark.operators.text_analysis import ranked_retrieval

    rows = [
        (1, "spark spark join"),   # tf(spark)=2, tf(join)=1
        (2, "join scan"),
        (3, "scan scan scan"),
        (4, "other words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        tuple(r)
        for r in ranked_retrieval(df, {"q": ["spark", "join"]}, k=10)
        .orderBy("doc_rank")
        .collect()
    ]
    # n_docs=4; df(spark)=1 -> idf 4_000_000; df(join)=2 -> idf 2_000_000
    # doc1: 2*4M + 1*2M = 10M, matched 2; doc2: 1*2M, matched 1
    assert got == [
        ("q", 1, 2, 10_000_000, 1),
        ("q", 2, 1, 2_000_000, 2),
    ]


def test_ranked_retrieval_missing_term_and_ties(spark):
    from openie_spark.operators.text_analysis import ranked_retrieval

    rows = [(1, "a b"), (2, "a b"), (3, "c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        tuple(r)
        for r in ranked_retrieval(df, {"q": ["a", "nosuchterm"]}, k=1)
        .collect()
    ]
    # equal scores -> tie broken toward the smaller doc_id; k=1 keeps doc 1
    assert got == [("q", 1, 1, 1_500_000, 1)]


def test_importance_scores_hand_computed(spark):
    from openie_spark.operators.text_analysis import importance_scores

    docs = spark.createDataFrame(
        [(1, "en", "a b"), (2, "de", "a c"), (3, "de", "b b")],
        "doc_id bigint, lang string, text string",
    )
    got = [
        (r["doc_id"], r["lang"], r["n_tokens"], r["score_micro"])
        for r in importance_scores(docs).collect()
    ]
    # corpus: a=2 b=3 c=1; target(en): a=1 b=1 -> w(a)=500000,
    # w(b)=333333, w(c)=0; per-occurrence additive sums:
    assert got == [
        (1, "en", 2, 833_333),
        (3, "de", 2, 666_666),
        (2, "de", 2, 500_000),
    ]
