"""BM25 ranked retrieval (operators/ranking.py): hand-computed scores,
deterministic top-k cut, and the broadcast/top-k plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clinvar_ingest_spark.operators.ranking import bm25_topk

DOCS = [
    (1, "spark merge spark spark"),
    (2, "merge vector merge"),
    (3, "the quick brown fox"),
    (4, "spark"),
    (5, ""),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation (test-only)."""
    toks = {i: (t.split() if t.strip() else []) for i, t in docs}
    dl = {i: len(v) for i, v in toks.items()}
    n = float(len(docs))
    avgdl = sum(dl.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, v in toks.items():
            tf = float(v.count(term))
            if tf == 0:
                continue
            w = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl[i] / avgdl))
            s, c = out.get(i, (0.0, 0))
            out[i] = (s + w, c + 1)
    return {i: (c, round(s * 10000.0)) for i, (s, c) in out.items()}


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["bm25_e4"])
        for r in bm25_topk(df, ["spark", "merge"], k=10).collect()
    }
    assert got == _ref_bm25(DOCS, ["spark", "merge"])


def test_bm25_topk_cut_is_deterministic(spark):
    # four identical single-term docs -> equal scores; the k=2 cut must
    # keep the two lowest doc_ids (integer tie-break, not plan order)
    rows = [(i, "needle") for i in (9, 3, 7, 1)] + [(100, "hay")]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    out = bm25_topk(df, ["needle"], k=2).collect()
    assert [r["doc_id"] for r in out] == [1, 3]


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, ["spark", "merge"], k=3)._jdf.queryExecution().executedPlan().toString()
    # distributed top-k, never a global sort
    assert "TakeOrderedAndProject" in plan
    # corpus stats reach the scored rows via broadcast, not shuffle
    assert plan.count("BroadcastExchange") >= 1
    # corpus tokenized exactly twice (stats + tf); dfreq must NOT
    # recompute the scan lineage a third time
    assert plan.count("FileScan") + plan.count("Scan ExistingRDD") <= 2
    # the term filter exists pre-aggregation (pushed below the tf agg)
    assert "needle" not in plan  # sanity: plan string is for this query


def test_bm25_empty_terms_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    try:
        bm25_topk(df, [])
        assert False, "expected ValueError"
    except ValueError:
        pass
