"""Deterministic sampling + stratified selection (round 3)."""

import pytest
from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.sampling import hash_sample, stratified_topk


@pytest.fixture()
def docs(spark):
    rows = [
        (i, "en" if i % 2 == 0 else "de", "x " * (i % 17 + 1)) for i in range(400)
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 10, 100).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 10, 100).collect()
    }
    assert a == b and len(a) > 0  # pure function of the key
    # rate is approximately num/den (md5 uniformity over 400 keys)
    assert 0.04 < len(a) / 400 < 0.18
    # monotone: a 10% sample is a superset of the 5% sample (same hash)
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 5, 100).collect()}
    assert c <= a
    # a different salt draws a different (independent) sample
    d = {
        r["doc_id"]
        for r in hash_sample(docs, "doc_id", 10, 100, salt="s2").collect()
    }
    assert d != a


def test_hash_sample_consistent_across_tables(spark, docs):
    """Tables sharing the key select MATCHING rows — the property that
    lets a pipeline sample documents and their embeddings coherently."""
    other = docs.select(F.col("doc_id"), F.lit(1).alias("z"))
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 7, 50).collect()}
    b = {r["doc_id"] for r in hash_sample(other, "doc_id", 7, 50).collect()}
    assert a == b


def test_hash_sample_validates_rate(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 101, 100)


def test_stratified_topk(docs):
    out = stratified_topk(
        docs, "lang", F.length("text"), k=3, tie_col="doc_id"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == {"en", "de"}
    for lang, rows in by_lang.items():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
        # scores non-increasing by rank; ties broken by smallest doc_id
        ordered = sorted(rows, key=lambda r: r["rank"])
        lens = [len(r["text"]) for r in ordered]
        assert lens == sorted(lens, reverse=True)
        for x, y in zip(ordered, ordered[1:]):
            if len(x["text"]) == len(y["text"]):
                assert x["doc_id"] < y["doc_id"]
