"""Corpus-scale BPE merge learning — tokenizer TRAINING as a DataFrame
program (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"; the learned counterpart of tokenization.py's fixed
whitespace vocabulary).

Formulation (the standard scalable one): BPE statistics depend only on the
WORD-FREQUENCY table, not the raw corpus — so the corpus is reduced once
to (word, n) (vocabulary-bounded, the tfidf/vocab_encode posture), each
word becomes its character-symbol array plus an end-of-word marker, and
every merge round is:

  1. adjacent-pair counts weighted by word frequency — one
     map-side-combinable groupBy over the vocab table;
  2. argmax pair with the frozen tie-break (count desc, then
     lexicographically smallest (lhs, rhs)) — a 1-row driver collect,
     data-size-independent;
  3. apply the merge to every symbol array with a pure-JVM left-to-right
     aggregate() fold (greedy leftmost application, the reference
     semantics: "aaa" + merge (a,a) → (aa, a)) — no Python, no shuffle;
  4. lineage cut (the iterative-loop rule).

At the 10^12-token posture the only corpus-sized pass is the initial word
count; everything after runs on the distinct-word table.  Determinism:
counts are exact integers and the tie-break is total, so the learned merge
table is bit-reproducible — the oracle is a pure-Python twin
(fixtures/gen_bpe_twin.py) replaying the same frozen rules single-process.

ANSI note: the fold's element_at(acc, -1) sits behind a size(acc) > 0
CASE guard (CaseWhen evaluates lazily), so the empty initial accumulator
never trips ANSI's out-of-bounds error; symbol arrays themselves are
always >= 2 long (>= 1 char + the EOW marker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openie_spark.functions.lineage import cut_lineage

BPE_MERGES = 10
BPE_EOW = "</w>"  # end-of-word marker, fused into merged tokens like any char


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace-lower tokens (the tokenization rule shared
    with the other text operators) — the single corpus-sized pass."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _apply_merge(sym_col, a: str, b: str):
    merged = F.array(F.lit(a + b))
    return F.aggregate(
        sym_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _initial_syms(df: DataFrame, text_col: str) -> DataFrame:
    """(n, s): per-distinct-word count + character symbol sequence with
    the EOW marker — the ONE corpus-sized pass (everything after runs on
    the vocabulary-bounded frame)."""
    words = word_frequencies(df, text_col)
    return cut_lineage(
        words.select(
            "n",
            F.concat(F.split("word", ""), F.array(F.lit(BPE_EOW))).alias("s"),
        ),
        eager=True,
    )


def _learn(
    syms: DataFrame, merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The merge-learning loop over an ``(n, s)`` frame: returns the rule
    list AND the fully-merged symbol frame, so callers that need the
    encoded corpus (bpe_encode_tokens) do not replay the folds."""
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(1, merges + 1):
        # single-symbol rows (fully merged words) contribute no pairs AND
        # would make sequence(1, size-1) = sequence(1, 0), which Spark
        # generates DESCENDING — element_at(s, 2) then trips ANSI's
        # out-of-bounds on a 1-element array (caught by the fuzz gate)
        pair_idx = F.sequence(F.lit(1), F.size("s") - 1)
        pairs = syms.where(F.size("s") >= 2).select(
            "n",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.element_at("s", i).alias("lhs"),
                        F.element_at("s", i + 1).alias("rhs"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.lhs", "p.rhs")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        rules.append((rank, a, b, cnt))
        syms = syms.select("n", _apply_merge(F.col("s"), a, b).alias("s"))
        syms = cut_lineage(syms)
    return rules, syms


def learn_bpe_merges(
    df: DataFrame, text_col: str = "text", merges: int = BPE_MERGES
) -> DataFrame:
    """Learn ``merges`` BPE rules from the corpus; returns the merge table
    (rank 1.., lhs, rhs, n) — n is the corpus-weighted count of the pair
    at the moment it was chosen.  Stops early (fewer rows) only if the
    vocabulary runs out of adjacent pairs."""
    rules, _ = _learn(_initial_syms(df, text_col), merges)
    return df.sparkSession.createDataFrame(
        rules, "rank bigint, lhs string, rhs string, n bigint"
    )


BPE_TOKEN_TOP = 100


def bpe_encode_tokens(
    df: DataFrame,
    text_col: str = "text",
    merges: int = BPE_MERGES,
    top: int = BPE_TOKEN_TOP,
) -> DataFrame:
    """Tokenizer APPLICATION: encode the corpus with the merges just
    learned and return the top-``top`` subword tokens by corpus-weighted
    count — (token, total), ordered (total DESC, token).

    The learning loop ENDS with exactly the encoded symbol frame
    (``_learn`` returns it alongside the rules), so encoding costs no
    second corpus pass and no replayed folds — the only corpus-sized
    work is the initial word count; the final token stats are one
    vocabulary-bounded aggregate."""
    _, syms = _learn(_initial_syms(df, text_col), merges)
    return (
        syms.select(F.explode("s").alias("token"), "n")
        .groupBy("token")
        .agg(F.sum("n").alias("total"))
        .orderBy(F.desc("total"), "token")
        .limit(top)
    )
