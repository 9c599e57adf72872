"""Train/eval decontamination: n-gram overlap against a benchmark set."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.decontam import decontaminate, ngram_overlap


@pytest.fixture()
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "a totally unrelated document about spark plans"),
            (2, "quick brown fox appears here too"),  # shares 'quick brown fox'
            (3, "xx"),  # too short for any trigram
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], ["doc_id", "text"]
    )
    return docs, bench


def test_ngram_overlap_counts(corpus):
    docs, bench = corpus
    out = {
        r["doc_id"]: (r["n_overlap_grams"], r["contaminated"])
        for r in ngram_overlap(docs, bench, n=3).collect()
    }
    assert len(out) == 5  # every candidate doc gets a row, clean ones included
    # doc 0 shares 'the quick brown' and 'quick brown fox'
    assert out[0] == (2, True)
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    assert out[3] == (0, False)
    assert out[4] == (0, False)


def test_decontaminate_filters(corpus):
    docs, bench = corpus
    kept = decontaminate(docs, bench, n=3)
    assert kept.columns == docs.columns  # original schema preserved
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]


def test_overlap_shuffle_variant(corpus):
    """broadcast_benchmarks=False must give identical answers."""
    docs, bench = corpus
    a = sorted(map(tuple, ngram_overlap(docs, bench).collect()))
    b = sorted(
        map(tuple, ngram_overlap(docs, bench, broadcast_benchmarks=False).collect())
    )
    assert a == b
