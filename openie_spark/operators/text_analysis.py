"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All hot-path math is JVM-side built-ins (split/regexp/aggregate) — these run
over every document at 100 TB scale, so no Python appears anywhere here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Frozen per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small + disjoint: the score is the count of marker hits.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "was", "with"],
    "fr": ["le", "la", "les", "est", "et", "avec"],
    "es": ["el", "los", "es", "con", "para", "una"],
    "de": ["der", "die", "das", "ist", "und", "mit"],
}


def tokens_col(text_col: str):
    """Whitespace tokenization (the cheap path)."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def bpe_ish_tokens_col(text_col: str):
    """BPE-ish segmentation: words, numbers, and single punctuation marks as
    separate tokens (regexp_extract_all, JVM-side)."""
    return F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_ws_tokens", F.size(tokens_col(text_col))).withColumn(
        "n_bpe_tokens", F.size(bpe_ish_tokens_col(text_col))
    )


def lang_score_col(text_col: str, lang: str):
    toks = tokens_col(text_col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker-hit counts, deterministic
    tie-break by language code order, 'und' when nothing matches."""
    scored = df
    for lang in sorted(LANG_MARKERS):
        scored = scored.withColumn(f"_s_{lang}", lang_score_col(text_col, lang))
    pairs = F.array(
        *[
            F.struct(
                (-F.col(f"_s_{lang}")).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_min(pairs)
    out = scored.withColumn(
        "lang_pred",
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("und")),
    )
    return out.drop(*[f"_s_{lang}" for lang in sorted(LANG_MARKERS)])


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features: char length, word count, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio — the standard
    cheap pre-training filters, all as exact-arithmetic columns."""
    toks = tokens_col(text_col)
    n_chars = F.length(text_col)
    n_words = F.size(toks)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    en = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    return (
        df.withColumn("q_n_chars", n_chars)
        .withColumn("q_n_words", n_words)
        .withColumn(
            "q_mean_word_len",
            F.when(n_words > 0, F.round(n_chars / n_words, 4)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_punct_ratio",
            F.when(n_chars > 0, F.round(n_punct / n_chars, 4)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_stopword_ratio",
            F.when(n_words > 0, F.round(n_stop / n_words, 4)).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "q_upper_ratio",
            F.when(n_chars > 0, F.round(n_upper / n_chars, 4)).otherwise(F.lit(0.0)),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full-content md5 (engine-portable) plus a
    shift-invariant rolling fingerprint = min over word-5-gram hashes
    (winnowing-style), robust to appends/prefix edits.

    The gram hash is the engine-portable 60-bit md5 scheme
    (functions/hashing.portable_hash60) rather than xxhash64, so the whole column
    is bit-reproducible on any engine and the driver can oracle-check it
    (DuckDB twin: CAST('0x' || substr(md5(gram),1,15) AS BIGINT)).  Still
    pure JVM built-ins — md5/conv inside an array `transform`, one pass,
    no Python fence."""
    from openie_spark.functions.hashing import portable_hash60

    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 5, F.lit(0)))
    gram_hashes = F.transform(
        idx, lambda i: portable_hash60(F.concat_ws(" ", F.slice(toks, i + 1, 5)))
    )
    return df.withColumn("fp_md5", F.md5(F.col(text_col))).withColumn(
        "fp_rolling_min", F.array_min(gram_hashes)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — how long documents
    become training examples.  Stride = chunk_tokens - overlap; the last
    chunk may be short; empty docs yield no chunks.  Pure JVM array HOFs
    (sequence → transform → slice → concat_ws): no Python, no explode
    until the final posexplode, and the chunk text is re-joined with
    single spaces (tokenization is the whitespace rule shared with the
    other text operators).  Emits (id, chunk_idx, n_tokens, chunk_text)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("w"))
    n = F.size("w")
    # chunk starts: 1, 1+stride, ... while start <= n (1-indexed slice);
    # the final window is dropped when it would be pure overlap (fully
    # contained in the previous chunk)
    n_chunks = F.when(
        n > 0, F.ceil((n - F.lit(overlap)) / F.lit(stride))
    ).otherwise(F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.when(
        n > 0,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.slice("w", i * stride + 1, chunk_tokens)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = base.select("id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out.select(
        F.col("id").alias(id_col),
        "chunk_idx",
        F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        "chunk_text",
    )


def word_ngrams_col(text_col: str, n: int):
    """Distinct word n-grams as an array column (whitespace-lower tokens,
    empties dropped — the tokenization rule shared with the other text
    operators).  Docs shorter than n words yield an empty array."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    sz = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(sz - (n - 1), F.lit(1)))
    return F.when(
        sz >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top: int = 50,
) -> DataFrame:
    """Corpus-wide heavy hitters: the `top` word n-grams ranked by document
    frequency (distinct-per-doc via word_ngrams_col, so a gram repeated
    inside one doc counts once).  Ties break on the gram itself so the
    cutoff is a total order and the result is engine-comparable.

    Scale shape: per-doc distinct grams explode map-side; the only shuffle
    is the groupBy(gram) count with partial aggregation (each task emits at
    most its local vocabulary per gram), and the global top-k compiles to
    TakeOrderedAndProject — no full sort, no window.  At 100 TB the reduce
    side is bounded by the corpus n-gram vocabulary, not the corpus size."""
    return (
        df.select(F.explode(word_ngrams_col(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("gram"))
        .limit(top)
    )


def dup_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    n: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicate n-gram mining — the exact-substring
    duplication signal behind suffix-array train-set dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022
    — public knowledge): every word n-gram appearing in >= min_docs
    DISTINCT documents, with its document frequency and the characters
    that would be saved by collapsing the duplicates
    (``dup_chars = (n_docs - 1) * length(gram)`` — integer-exact).

    Scale shape: per-doc distinct grams (word_ngrams_col — the shared
    tokenization rule) explode map-side; the ONLY shuffle is the
    groupBy(gram) count with partial aggregation, and the HAVING filter
    bounds the output by the *duplicated*-gram vocabulary — far smaller
    than the corpus.  No positions are materialized globally (a full
    span table would be corpus-sized; the stats are the curation
    signal)."""
    return (
        df.select(F.explode(word_ngrams_col(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select(
            "gram",
            "n_docs",
            ((F.col("n_docs") - 1) * F.length("gram")).cast("bigint").alias("dup_chars"),
        )
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Train/test decontamination (the n-gram-overlap procedure described in
    Brown et al. 2020 appendix C — public knowledge): flag corpus documents
    that share any word n-gram with a benchmark/eval set.

    Scale shape: benchmark suites are MBs even when the corpus is 100 TB, so
    the distinct benchmark grams are BROADCAST and the corpus side meets them
    in a map-side hash join — only matching (doc, gram) rows survive into the
    per-doc count shuffle, and per-doc totals come from the array column
    without any shuffle.  The corpus text itself is never re-shuffled."""
    grams = word_ngrams_col(text_col, n)
    bench_grams = benchmark.select(F.explode(grams).alias("gram")).distinct()
    base = corpus.select(F.col(id_col).alias("id"), grams.alias("g"))
    hits = (
        base.select("id", F.explode("g").alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return base.select("id", F.size("g").alias("n_grams")).join(hits, "id", "left").select(
        F.col("id").alias(id_col),
        "n_grams",
        F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
        (F.coalesce("n_hit_grams", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


RETRIEVAL_TOP_K = 10


def ranked_retrieval(
    df: DataFrame,
    queries: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = RETRIEVAL_TOP_K,
) -> DataFrame:
    """Multi-term ranked retrieval — the search-engine direction of the
    TF-IDF pipeline (tfidf_top_terms ranks terms per doc; this ranks docs
    per query): for each query (a bag of terms), score every matching
    document by Σ tf·idf_micro over the query terms it contains and return
    the top-k (score desc, doc id asc — total order).  idf_micro is the
    integer-exact ``(n_docs · 1e6) div df`` rule shared with
    tfidf_top_terms, so every score is engine-portable.  Emits
    (query_id, doc_id, n_terms_matched, score_micros, doc_rank).

    Scale shape: the query-term table is tiny at any corpus size →
    BROADCAST onto the postings, so only (doc, term) rows matching some
    query term survive into the per-(query, doc) shuffle; the df table is
    vocabulary-bounded and broadcast; the final top-k window compiles to
    WindowGroupLimit.  The corpus is scanned once."""
    spark = df.sparkSession
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(queries.items()) for t in set(terms)],
        "query_id string, term string",
    )
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    terms = df.select(F.col(id_col).alias("id"), F.explode(w).alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("query_id", "id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum(F.expr("tf * ((n_docs * 1000000) div df)")).alias(
                "score_micros"
            ),
        )
    )
    wnd = Window.partitionBy("query_id").orderBy(
        F.desc("score_micros"), F.asc("id")
    )
    return (
        scored.withColumn("doc_rank", F.row_number().over(wnd))
        .where(F.col("doc_rank") <= k)
        .select(
            "query_id",
            F.col("id").alias(id_col),
            "n_terms_matched",
            "score_micros",
            "doc_rank",
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k distinctive terms per document by integer-exact TF-IDF.

    idf is kept EXACT and engine-portable as ``(n_docs * 1e6) div df``
    (integer division — same rule as the pagerank oracle: float idf/log is
    libm-dependent and never hash-comparable across engines); the ranking it
    induces is the classic tf·(N/df) order.  Ties break by (df asc, term asc)
    so (id, term) uniqueness makes row_number deterministic.

    Scale shape: tf agg shuffles on (doc, term) with map-side combine; the
    term→df table is VOCABULARY-bounded, hence broadcast back onto tf; the
    corpus size joins in as a 1-row broadcast.  The only other shuffle is the
    per-doc top-k window, which compiles to WindowGroupLimit."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    terms = df.select(F.col(id_col).alias("id"), F.explode(w).alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_micros", F.expr("tf * ((n_docs * 1000000) div df)"))
    )
    wnd = Window.partitionBy("id").orderBy(
        F.desc("score_micros"), F.asc("df"), F.asc("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(wnd))
        .where(F.col("term_rank") <= k)
        .select(
            F.col("id").alias(id_col), "term_rank", "term", "tf", "df", "score_micros"
        )
    )


# PII patterns shared verbatim by the Spark operator and the DuckDB oracle —
# deliberately restricted to the regex subset where java.util.regex and RE2
# agree (char classes, bounded repetition; no backrefs, no lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction: count and replace email addresses and international
    phone numbers with typed placeholders — the standard pre-training scrub
    pass.  All JVM-side (regexp_count / regexp_replace); emails are replaced
    first so the phone pass cannot match inside a placeholder."""
    return (
        df.withColumn("n_emails", F.regexp_count(F.col(text_col), F.lit(PII_EMAIL_RE)))
        .withColumn("n_phones", F.regexp_count(F.col(text_col), F.lit(PII_PHONE_RE)))
        .withColumn(
            "scrubbed",
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            ),
        )
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public
    knowledge) — the standard corpus filters for boilerplate/spam:

      - dup_word_ratio:   1 - distinct_words / words
      - dup_2gram_ratio:  1 - distinct_2grams / 2grams
      - top_word_share:   occurrences of the most frequent word / words

    Word/2-gram ratios are pure JVM array expressions (no shuffle); the
    top-word share is the one genuinely grouped computation (explode →
    two-level agg, map-side combinable).  Empty-token filtering is explicit
    so the SQL oracle can mirror tokenization exactly."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("w"))
    n = F.size("w")
    idx2 = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0)))
    grams = F.when(
        n >= 2,
        F.transform(idx2, lambda i: F.concat_ws(" ", F.slice("w", i, 2))),
    ).otherwise(F.array().cast("array<string>"))
    ratios = base.select(
        "id",
        n.alias("n_words"),
        F.when(
            n > 0, F.round(F.lit(1.0) - F.size(F.array_distinct("w")) / n, 4)
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_ratio"),
        F.when(
            F.size(grams) > 0,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_ratio"),
    )
    freq = (
        base.select("id", F.explode("w").alias("word"))
        .groupBy("id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("max_c"))
    )
    return (
        ratios.join(freq, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "dup_word_ratio",
            "dup_2gram_ratio",
            F.when(
                F.col("n_words") > 0,
                F.round(F.coalesce("max_c", F.lit(0)) / F.col("n_words"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("top_word_share"),
        )
    )


def cooccurrence_lift(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 50,
    per_doc_cap: int = 20,
    min_pair_df: int = 2,
) -> DataFrame:
    """Token co-occurrence scored by lift — the KG edge-weighting step that
    turns "these two terms appear in the same documents" into a ranked
    association edge (lift = P(a,b)/(P(a)P(b)); PMI's exponential, kept in
    exact micro-unit integers instead of a float log so the score is
    bit-identical across engines).

    Scale shape (each guard exists because its absence is a 100 TB
    failure mode):
      - ABSOLUTE df band [min_df, max_df]: a ratio-only cap lets a token
        in 1% of 10^9 docs (10^7 postings) into the pair join — the
        ngram_jaccard lesson.  The kept-token table is vocab-bounded and
        broadcast.
      - per-doc rarest-K cap (row_number over (df, token) — a total
        order, so deterministic): bounds per-doc pair fan-out at C(K,2)
        regardless of document pathology.
      - min_pair_df floor drops the long singleton tail before the lift
        join.
    The only unbounded shuffles are groupBy(token) and groupBy(pair),
    both map-side combinable and vocabulary-bounded on the reduce side.
    """
    w = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    )
    toks = df.select(F.col(id_col).alias("id"), F.explode(w).alias("tok"))
    tok_df = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    kept = toks.join(F.broadcast(tok_df), "tok")
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy(F.asc("df"), F.asc("tok"))
    )
    kept = kept.withColumn("_rn", rn).where(F.col("_rn") <= per_doc_cap)
    a = kept.select("id", F.col("tok").alias("a"), F.col("df").alias("df_a"))
    b = kept.select("id", F.col("tok").alias("b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "id")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "df_a", "df_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_df)
    )
    n_docs = df.select(F.count("*").alias("n_docs"))
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "a",
        "b",
        "n_ab",
        F.expr("(1000000L * n_ab * n_docs) div (df_a * df_b)").alias(
            "lift_micro"
        ),
    )


# -- DSIR-style data-selection importance scoring (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling" — public
# knowledge).  DSIR weights candidate documents by how target-like their
# n-gram distribution is; the published form multiplies per-feature
# probability ratios in log space (float).  This engine's oracle
# discipline requires bit-identical values, so the score here is the
# ADDITIVE integer variant — documented as part of the declared
# semantics: every token occurrence contributes the exact micro-unit
# ratio (target_count * 1e6) div corpus_count, and a document's score is
# the sum over its occurrences.  Monotonicity in "target-likeness" is
# preserved; the exponential product is not.

IMPORTANCE_SCALE = 1_000_000
IMPORTANCE_TARGET_LANG = "en"
IMPORTANCE_TOP = 100


def importance_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    target_lang: str = IMPORTANCE_TARGET_LANG,
    top: int = IMPORTANCE_TOP,
) -> DataFrame:
    """Top-``top`` documents by additive DSIR-style importance.

    Output: (doc_id, lang, n_tokens, score_micro) ordered by
    (score DESC, doc_id).  Tokenization is the engine's frozen ASCII
    whitespace split (same JVM==twin semantics every text op pins).

    Scale shape: one corpus-sized token explode; the target and corpus
    token counts are vocabulary-bounded aggregates; the weight attach is
    an equi-join on the token (AQE broadcasts it at small SF; at web
    scale it is the standard posting-list shuffle — deliberately NOT a
    mandatory broadcast, the vocabulary of a 100 TB corpus is not
    driver-sized); the per-doc sum is map-side combinable; the final
    top-k is one WindowGroupLimit-free global sort-limit of bounded
    size."""
    w = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    toks = df.select(
        F.col(id_col).alias("id"), F.col(lang_col).alias("lang"), F.explode(w).alias("tok")
    )
    corpus = toks.groupBy("tok").agg(F.count("*").alias("cc"))
    target = (
        toks.where(F.col("lang") == target_lang)
        .groupBy("tok")
        .agg(F.count("*").alias("tc"))
    )
    weights = corpus.join(target, "tok", "left").select(
        "tok",
        F.expr(f"coalesce(tc, 0L) * {IMPORTANCE_SCALE} div cc").alias("w_micro"),
    )
    return (
        toks.join(weights, "tok")
        .groupBy(F.col("id").alias("doc_id"), "lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w_micro").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(top)
    )
