"""Text analysis kernels: token counting, quality, lang-id, fingerprints."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.functions import text as tx


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat and the dog, in a house!"),
            (1, "der hund und die katze ist nicht da"),
            (2, "le chat et le chien est dans la maison"),
            (3, "zzz qqq xxx"),
            (4, ""),
            (5, "  spaced   out  "),
        ],
        ["doc_id", "text"],
    )


def test_token_counts(docs):
    out = docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n"),
        tx.distinct_token_count(F.col("text")).alias("d"),
    ).collect()
    m = {r["doc_id"]: (r["n"], r["d"]) for r in out}
    assert m[0] == (8, 7)  # 'the' twice
    assert m[4] == (0, 0)
    assert m[5] == (2, 2)


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(0, "hello world42 x-y!")], ["id", "text"])
    n = df.select(tx.bpe_token_count(F.col("text")).alias("n")).collect()[0]["n"]
    # hello | world | 42 | x | - | y | !
    assert n == 7


def test_quality_columns(docs):
    out = tx.quality_columns(docs).filter(F.col("doc_id") == 0).collect()[0]
    assert out["n_tokens"] == 8
    assert out["n_stopwords_en"] == 5  # the, and, the(in 'the dog,'? no) ...
    assert out["n_punct"] == 2  # comma + bang


def test_lang_id(docs):
    pred = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", tx.lang_id_expr(F.col("text")).alias("lang")
        ).collect()
    }
    assert pred[0] == "en"
    assert pred[1] == "de"
    assert pred[2] == "fr"
    assert pred[3] == "unk"


def test_rolling_fingerprints(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "a b c d e f g h i j"), (2, "short text")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["fps"]
        for r in df.select(
            "id", tx.rolling_fingerprints(F.col("text"), window=8).alias("fps")
        ).collect()
    }
    assert out[0] == out[1]
    assert len(out[0]) == 3  # 10 tokens, window 8 → 3 windows
    assert out[2] == []


def test_repetition_columns(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),          # 'a'×3; trigrams: aba, bab, aba, bab → 2 distinct of 4
            (1, "one two three four"),   # all unique; 2 trigrams, both distinct
            (2, "xx"),                   # 1 token → 0 trigrams
            (3, ""),                     # empty → all zero
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["top_token_count"], r["n_trigrams"], r["n_distinct_trigrams"])
        for r in tx.repetition_columns(df).collect()
    }
    assert out[0] == (3, 4, 2)
    assert out[1] == (1, 2, 2)
    assert out[2] == (1, 0, 0)
    assert out[3] == (0, 0, 0)
