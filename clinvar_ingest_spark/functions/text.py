"""Text analysis kernels for training-data pipelines — all as column
expressions (JVM-side, codegen'd; no Python in the hot path) so a 100 TB
corpus pays zero serialization.

- :func:`token_count` / :func:`distinct_token_count` — whitespace +
  BPE-ish regex token counting.
- :func:`quality_columns` — length / punctuation / stopword-ratio /
  repetition quality signals.
- :func:`lang_id_expr` — n-gram/stopword-heuristic language ID over a
  small per-language marker table.
- :func:`fingerprint_md5` / :func:`rolling_fingerprints` — document
  fingerprints (md5 whole-doc; rolling window hashes for overlap
  detection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

WS_SPLIT = r"\s+"
# BPE-ish: letters runs, digit runs, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "it": ["il", "la", "gli", "e", "è", "un", "una", "per", "che", "non"],
}


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), WS_SPLIT)


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def distinct_token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(tokens(col)))
    )


def stopword_count(col: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(sw, t)))


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))


def top_token_count(col: Column) -> Column:
    """Occurrences of the document's most frequent token — the
    numerator of the Gopher-style "top word fraction" repetition
    filter. O(distinct × tokens) JVM array ops per row (no shuffle,
    no Python); fine for web-page-sized documents."""
    t = tokens(col)
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda d: F.size(F.filter(t, lambda x: x == d)),
            )
        )
    )


def trigram_count(col: Column) -> Column:
    """Total word trigrams (= max(n_tokens - 2, 0))."""
    return F.greatest(token_count(col) - 2, F.lit(0))


def distinct_trigram_count(col: Column) -> Column:
    """Distinct word trigrams — with :func:`trigram_count` this gives
    the duplicate-trigram fraction (Gopher/C4-style within-document
    repetition signal), left as exact integers per the module rule."""
    t = tokens(col)
    grams = F.when(F.size(t) < 3, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        )
    )
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(grams))
    )


def repetition_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append within-document repetition signals (exact integers):
    ``top_token_count``, ``n_trigrams``, ``n_distinct_trigrams``.
    Downstream gates divide by ``n_tokens``/``n_trigrams`` for the
    published-recipe ratios."""
    c = F.col(text_col)
    return (
        df.withColumn("top_token_count", top_token_count(c))
        .withColumn("n_trigrams", trigram_count(c))
        .withColumn("n_distinct_trigrams", distinct_trigram_count(c))
    )


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns (all integers → exact cross-engine
    comparison; ratios are left to the consumer to avoid float drift).
    """
    c = F.col(text_col)
    return (
        df.withColumn("n_chars_m", F.length(c))
        .withColumn("n_tokens", token_count(c))
        .withColumn("n_distinct_tokens", distinct_token_count(c))
        .withColumn("n_stopwords_en", stopword_count(c, "en"))
        .withColumn("n_punct", punct_count(c))
    )


def lang_id_expr(col: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    (ties broken by language code order); 'unk' when zero hits.
    """
    toks = tokens(F.lower(col))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # max by (hits, -lang-order): array_max on struct compares fieldwise;
    # to break ties toward the alphabetically-first lang, negate via sort
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["hits"].alias("hits"),
                    F.lit(len(scores) - i).alias("prio"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["hits"] <= 0, F.lit("unk")).otherwise(best["lang"])


def fingerprint_md5(col: Column) -> Column:
    return F.md5(col)


def rolling_fingerprints(col: Column, window: int = 8) -> Column:
    """Array of xxhash64 fingerprints over sliding token windows —
    overlap/containment detection between documents.
    """
    toks = tokens(col)
    return F.when(F.size(toks) < window, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        )
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus vocabulary: the k most frequent whitespace tokens with
    exact counts — the seed step of tokenizer training (BPE starts from
    a word-frequency table) and the dataset-card "top terms" stat.

    Plan: explode → ONE hash aggregate on the token (map-side combined;
    stopword-heavy skew is absorbed by the partial agg — a hot token
    arrives at the reducer once per map partition, not once per
    occurrence) → global top-k. The final ordering is a driver-side
    sort of k rows, not a full shuffle sort; ties break on the token
    string so both engines agree row-for-row.
    """
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = toks.filter(F.col("token") != "").groupBy("token").agg(
        F.count("*").alias("n")
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    )
