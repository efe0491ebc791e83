"""Text-analysis operators for a training-data pipeline.

All pure column expressions over ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen, no Python in the hot path.  Each has an exact
ANSI-SQL twin for the DuckDB oracle (see entry_queries), so semantics are
pinned cross-engine: tokenization is whitespace-regex, hashes are
md5-hex-substring (identical in both engines), ratios are single-op double
divisions (deterministic IEEE in both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-language stopword lists for the n-gram/stopword lang-ID heuristic;
# order = deterministic tie-break priority
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "zu", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

PUNCT_REGEX = "[,.!?;:]"


def tokenize(text: Column) -> Column:
    """Whitespace tokens of a trimmed, lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokenize(text))
    )


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def _stopword_hits(words: Column, stopwords: list[str]) -> Column:
    """How many words are in the stopword list (with multiplicity)."""
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def lang_id(text: Column) -> Column:
    """Stopword-overlap language heuristic with deterministic tie-break:
    highest hit-count wins; ties resolve in LANG_STOPWORDS order; zero hits
    everywhere → 'und' (undetermined)."""
    words = tokenize(text)
    result = F.lit("und")
    best = F.lit(0)
    # iterate in reverse priority so earlier languages win ties via >=
    for lang in reversed(list(LANG_STOPWORDS)):
        hits = _stopword_hits(words, LANG_STOPWORDS[lang])
        take = hits >= F.greatest(best, F.lit(1))
        result = F.when(take, F.lit(lang)).otherwise(result)
        best = F.greatest(best, hits)
    return result


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punctuation and
    stopword ratios, and a composite [0,1] score.  Ratios are single-op
    double divisions — bit-identical across engines."""
    n_chars = F.length(text)
    words = tokenize(text)
    n_tokens = token_count(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_REGEX), 0))
    n_stop = _stopword_hits(words, LANG_STOPWORDS["en"])
    nt = n_tokens.cast("double")
    avg_token_len = F.when(n_tokens > 0, n_chars.cast("double") / nt).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    stopword_ratio = F.when(n_tokens > 0, n_stop.cast("double") / nt).otherwise(F.lit(0.0))
    # composite: reward mid-length docs with some stopwords, punish symbol soup
    length_ok = ((n_tokens >= 5) & (n_tokens <= 100000)).cast("double")
    score = (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * F.least(F.lit(1.0), stopword_ratio * 4.0)
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10.0))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "quality_score": score,
    }


# Deliberately simple patterns that Java regex (Spark) and RE2 (DuckDB,
# used by the oracle) interpret identically: character classes, +, {m,n} —
# no backrefs, no lookaround.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row counts of email / phone matches (audit before redaction)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)).cast("int"),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)).cast("int"),
    }


def redact_pii(text: Column) -> Column:
    """Replace every email/phone match with a typed placeholder — the
    standard scrub pass before corpus text reaches a training set.  Pure
    codegen expressions (regexp_replace), shuffle-free."""
    return F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "[EMAIL]"), PII_PHONE_RE, "[PHONE]"
    )


def repetition_stats(text: Column) -> Column:
    """struct<top_word_count int, n_words int> — highest single-word
    occurrence count and total word count (boilerplate/spam signal:
    filter on top_word_count/n_words).

    Computed with zero shuffle: sort the row's word array, then one
    ``aggregate`` fold counts the longest equal-run — identical to
    explode → groupBy(doc, word) → max(count) but without moving any data
    (the explode formulation shuffles |corpus tokens| rows)."""
    words = F.array_sort(
        F.filter(F.split(F.lower(text), "[^a-z]+"), lambda w: w != "")
    )
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("total"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["total"] + 1).alias("total"),
        )

    return F.aggregate(
        words,
        zero,
        step,
        lambda acc: F.struct(
            acc["best"].alias("top_word_count"), acc["total"].alias("n_words")
        ),
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Per-document top-*k* terms by tf-idf relevance (rarity-weighted
    term frequency, scored as ``tf / df`` — a single IEEE division, so
    ranking is bit-identical cross-engine; output columns are all
    integer/string, no floats to hash).

    Scale shape: explode → groupBy(doc, term) partial-aggregates map-side
    before its shuffle (the combiner collapses repeated terms per doc, so
    the exchange carries (doc, term, count) triples, not raw tokens); the
    document-frequency frame is vocab-sized and the tf×df join is left to
    AQE — broadcast when the vocab fits, shuffle-hash when a 100 TB
    corpus's vocabulary doesn't.  The top-k window partitions by doc_id
    (bounded per-partition work at any corpus size)."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode_outer(tokenize(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("term_freq"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    w = Window.partitionBy(id_col).orderBy(
        (F.col("term_freq").cast("double") / F.col("doc_freq").cast("double")).desc(),
        F.col("term"),
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "term_freq", "doc_freq", "rank")
    )


def bm25_topk(
    df, id_col: str, text_col: str, query_terms: list[str], k: int = 10
):
    """Top-*k* documents for a term query under BM25 (k1=1.2, b=0.75) —
    the retrieval scorer behind corpus search and RAG candidate
    generation — made CROSS-ENGINE EXACT by keeping every scoring factor
    a ratio of integers.

    The usual BM25 needs ``log`` for IDF and a float ``avgdl``; both
    poison bit-equality between engines (libm vs JVM log differ in the
    last ulp, and float sums are order-dependent).  Instead, with
    k1 = 6/5, b = 3/4, avgdl = S/N (S = corpus token count, N = corpus
    doc count), the per-term factors reduce algebraically to integer
    ratios::

        tf_part  = 44·S·tf / (20·S·tf + 6·S + 18·dl·N)
        idf_part = (2N − 2df + 1) / (2df + 1)      # the log-free
                                                   # Robertson idf
    so each is ONE IEEE division of exactly-representable integers —
    bit-identical in Spark and DuckDB — and each term's contribution is
    quantized to an integer (``round(1e6 · tf_part · idf_part)``)
    BEFORE the per-document sum, which is then exact integer addition in
    any order.  Ranking ties break by doc id.

    Validity bound: "exactly representable" holds only while every
    intermediate product stays under 2^53 — the binding ones are
    ``44·S·tf`` and ``18·dl·N`` (S = corpus token count, N = corpus doc
    count, dl ≤ longest doc).  With tf ≤ dl that is safe up to roughly
    S·dl < 2·10^14 (e.g. a 10^11-token corpus with 1k-token docs);
    beyond it the integer-ratio premise silently degrades to ordinary
    float error and cross-engine rankings may drift at ties.  Shard the
    corpus (per-shard S, N) or rescale the quantization before that
    point.

    Scale shape: the token explode filters to the query terms with a
    LITERAL ``isin`` before any shuffle (the tf aggregation carries only
    matching (doc, term) pairs); corpus scalars (N, S) and the per-term
    doc frequencies are one-row/terms-sized broadcasts; the final top-k
    is ``orderBy().limit()`` → TakeOrderedAndProject (per-partition
    heaps + driver merge), never a global sort."""
    toks = df.select(
        F.col(id_col), F.explode_outer(tokenize(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(F.sum("__dl").alias("__S")).crossJoin(
        df.agg(F.count(F.lit(1)).alias("__N"))
    )
    tf = (
        toks.filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    joined = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    tf_part = (F.lit(44.0) * F.col("__S") * F.col("__tf")) / (
        F.lit(20.0) * F.col("__S") * F.col("__tf")
        + F.lit(6.0) * F.col("__S")
        + F.lit(18.0) * F.col("__dl") * F.col("__N")
    )
    idf_part = (
        F.lit(2.0) * F.col("__N") - F.lit(2.0) * F.col("__df") + F.lit(1.0)
    ) / (F.lit(2.0) * F.col("__df") + F.lit(1.0))
    contrib = F.round(F.lit(1000000.0) * tf_part * idf_part).cast("long")
    scored = joined.groupBy(id_col).agg(
        F.sum(contrib).alias("score_q"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    return scored.orderBy(
        F.col("score_q").desc(), F.col(id_col).asc()
    ).limit(k)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized, lowercased text (content-defined identity for
    exact dedup across formatting differences)."""
    normalized = F.concat_ws(" ", tokenize(text))
    return F.md5(normalized)
