"""Unigram LM scoring (operators/quality_lm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from clinvar_ingest_spark.operators.quality_lm import (
    unigram_counts,
    unigram_logprob,
)

DOCS = [
    Row(doc_id=1, text="the cat sat on the mat"),
    Row(doc_id=2, text="the dog sat"),
    Row(doc_id=3, text="zyzzyva qwerty"),  # all-OOV at vocab_k=3
    Row(doc_id=4, text="   "),  # no tokens -> no output row
]


def _ref_scores(vocab_k):
    """Row-at-a-time reference implementation."""
    toks = {
        r.doc_id: r.text.split() for r in DOCS if r.text.split()
    }
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    T, V = sum(counts.values()), len(counts)
    vocab = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    )
    out = {}
    for did, ts in toks.items():
        nll = sum(
            math.log(T + V + 1) - math.log(vocab.get(t, 0) + 1) for t in ts
        )
        out[did] = (
            len(ts),
            sum(1 for t in ts if t not in vocab),
            round(100 * nll / (len(ts) * math.log(2))),
        )
    return out


@pytest.mark.parametrize("vocab_k", [3, 100])
def test_matches_reference(spark, vocab_k):
    df = spark.createDataFrame(DOCS)
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.bits_e2)
        for r in unigram_logprob(df, vocab_k=vocab_k).collect()
    }
    assert got == _ref_scores(vocab_k)
    # blank doc contributes no row
    assert 4 not in got


def test_persisted_counts_path_equals_inline(spark, tmp_path):
    df = spark.createDataFrame(DOCS)
    p = str(tmp_path / "counts.parquet")
    unigram_counts(df).write.parquet(p)
    a = sorted(map(tuple, unigram_logprob(df, vocab_k=3).collect()))
    b = sorted(
        map(
            tuple,
            unigram_logprob(
                df, vocab_k=3, counts=spark.read.parquet(p)
            ).collect(),
        )
    )
    assert a == b


def test_model_join_is_broadcast(spark):
    df = spark.createDataFrame(DOCS)
    plan = unigram_logprob(df, vocab_k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
